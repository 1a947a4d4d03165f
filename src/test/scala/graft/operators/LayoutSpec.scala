package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spreadRef(x: Long): Long = {
    var a = x & 0xFFFFL
    a = (a | (a << 8)) & 0x00FF00FFL
    a = (a | (a << 4)) & 0x0F0F0F0FL
    a = (a | (a << 2)) & 0x33333333L
    (a | (a << 1)) & 0x55555555L
  }

  test("spread16/zValue match the reference bit cascade, and z is a bijection") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.spread16(col("x")).as("sx"),
        Layout.zValue(col("x"), col("y")).as("z"))
    val rows = df.as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (x, y, sx, z) =>
      assert(sx == spreadRef(x))
      assert(z == (spreadRef(x) | (spreadRef(y) << 1)))
    }
    // distinct points → distinct z (interleaving is invertible)
    assert(rows.map(_._4).distinct.length == pts.length)
  }

  test("power-of-two z-buckets are axis-aligned squares (the locality contract)") {
    val pts = (0L until 256L).flatMap(x => Seq((x, (x * 31) % 256), (x, (x * 7) % 256)))
    val extents = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .withColumn("bucket", Layout.zBucket(col("z"), 16, 16))
      .groupBy("bucket")
      .agg((max("x") - min("x")).as("wx"), (max("y") - min("y")).as("wy"))
      .as[(Long, Long, Long)].collect()
    // 16 buckets over a 16-bit z-space = top 4 bits = 2 y-bits + 2 x-bits
    // → every bucket is a 64×64 square of the 256×256 grid.
    extents.foreach { case (b, wx, wy) =>
      assert(wx <= 63 && wy <= 63, s"bucket $b spans ${wx}×$wy - not a 64×64 square")
    }
  }

  test("a bucket-partitioned write actually skips files under a range predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    try {
      (0L until 4096L).map(i => (i, i % 256, (i * 7) % 256)).toDF("id", "x", "y")
        .withColumn("bucket",
          Layout.zBucket(Layout.zValue(col("x"), col("y")), 16, 16))
        .write.partitionBy("bucket").mode("overwrite").parquet(dir)
      val all = spark.read.parquet(dir)
      val totalFiles = all.inputFiles.length
      assert(totalFiles >= 16, s"expected ≥16 partition files, got $totalFiles")
      // a 2-D range predicate (x,y both < 64) touches exactly ONE bucket
      // after z-mapping — prune via the bucket column like a reader would
      val filtered = all.filter(col("bucket") === 0)
      filtered.foreach(_ => ())
      import org.apache.spark.sql.execution.FileSourceScanExec
      val scan = filtered.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }.head
      val read = scan.metrics("numFiles").value
      assert(read < totalFiles / 4,
        s"partition pruning read $read of $totalFiles files")
      // and the surviving rows really are the 64×64 corner
      val (mx, my) = filtered.agg(max("x"), max("y"))
        .as[(Long, Long)].collect().head
      assert(mx <= 63 && my <= 63)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("clusterByZ orders rows by z within range partitions") {
    val df = (0L until 1000L).map(i => (i, (i * 13) % 256, (i * 29) % 256))
      .toDF("id", "x", "y")
    val clustered = Layout.clusterByZ(df, col("x"), col("y"), 4)
    // per partition, z must be non-decreasing (sortedness via mapPartitions)
    val sortedPerPart = clustered
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .select("z").as[Long]
      .mapPartitions(it => Iterator.single(it.foldLeft((true, Long.MinValue)) {
        case ((ok, prev), z) => (ok && z >= prev, z)
      }._1))
      .collect()
    assert(sortedPerPart.forall(identity))
    assert(clustered.count() == 1000)
  }
}
