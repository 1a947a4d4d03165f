package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import graft.expressions.{BpeSegment, IcosaEncode, IcosaLat, IcosaLng, PqQuantize, VecDot}

/** The engine's SparkSessionExtensions: registers the custom codegen'd
  * expressions so they resolve by name (`call_function("vec_dot", …)` /
  * SQL `vec_dot(a, b)`) in any session built through [[GraftSession]] —
  * or any deployment that adds
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    // Spark's own Bloom pair (the expressions behind AQE's injected
    // runtime filters) exposed by name for [[graft.operators.Prune]] —
    // catalyst ships them but does not register them publicly.
    ext.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_filter_agg"),
      (children: Seq[Expression]) =>
        new BloomFilterAggregate(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_quantize"),
      new ExpressionInfo(classOf[PqQuantize].getName, "pq_quantize"),
      (children: Seq[Expression]) =>
        PqQuantize(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("bpe_segment"),
      new ExpressionInfo(classOf[BpeSegment].getName, "bpe_segment"),
      (children: Seq[Expression]) =>
        BpeSegment(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("icosa_encode"),
      new ExpressionInfo(classOf[IcosaEncode].getName, "icosa_encode"),
      (children: Seq[Expression]) =>
        IcosaEncode(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("icosa_lat"),
      new ExpressionInfo(classOf[IcosaLat].getName, "icosa_lat"),
      (children: Seq[Expression]) => IcosaLat(children.head)))
    ext.injectFunction((
      FunctionIdentifier("icosa_lng"),
      new ExpressionInfo(classOf[IcosaLng].getName, "icosa_lng"),
      (children: Seq[Expression]) => IcosaLng(children.head)))
  }
}
