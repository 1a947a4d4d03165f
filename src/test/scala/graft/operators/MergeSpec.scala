package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def existing = Seq(("k1", 10L, 0), ("k2", 20L, 0)).toDF("_key", "val", "ver")
  private def incoming = Seq(("k2", 99L, 1), ("k3", 30L, 1)).toDF("_key", "val", "ver")

  test("upsert Update: incoming wins on matched keys, new keys insert") {
    val out = Merge.upsert(existing, incoming, "_key", Merge.Update, "ver")
      .select("_key", "val").as[(String, Long)].collect().toMap
    assert(out == Map("k1" -> 10L, "k2" -> 99L, "k3" -> 30L))
  }

  test("upsert Ignore: existing wins on matched keys, new keys still insert") {
    val out = Merge.upsert(existing, incoming, "_key", Merge.Ignore, "ver")
      .select("_key", "val").as[(String, Long)].collect().toMap
    assert(out == Map("k1" -> 10L, "k2" -> 20L, "k3" -> 30L))
  }

  test("upsert rejects mismatched schemas") {
    intercept[IllegalArgumentException] {
      Merge.upsert(existing, incoming.drop("ver"), "_key", Merge.Update, "ver")
    }
  }

  test("retain drops rows strictly below the cutoff") {
    val df = Seq(("a", 1L), ("b", 5L), ("c", 10L)).toDF("k", "t")
    assert(Merge.retain(df, "t", 5L).select("k").as[String].collect().toSet == Set("b", "c"))
  }

  test("upsertParquet: second identical epoch is a no-op (idempotent sync)") {
    val dir = Files.createTempDirectory("graft-upsert").toFile
    val path = new java.io.File(dir, "state").getAbsolutePath
    val epoch = Seq(("k1", 1L, 1L), ("k2", 2L, 1L)).toDF("_key", "val", "ver")
    Merge.upsertParquet(spark, path, epoch, "_key", Merge.Update, "ver")
    val after1 = spark.read.parquet(path).collect().toSet
    Merge.upsertParquet(spark, path, epoch, "_key", Merge.Update, "ver")
    val after2 = spark.read.parquet(path).collect().toSet
    assert(after1 == after2 && after1.size == 2)
    // and a real second epoch updates + inserts
    val epoch2 = Seq(("k2", 99L, 2L), ("k3", 3L, 2L)).toDF("_key", "val", "ver")
    Merge.upsertParquet(spark, path, epoch2, "_key", Merge.Update, "ver")
    val state = spark.read.parquet(path)
      .select("_key", "val").as[(String, Long)].collect().toMap
    assert(state == Map("k1" -> 1L, "k2" -> 99L, "k3" -> 3L))
  }

  private def chunks3 = Seq(
    Seq(("k1", 1L, 1L), ("k2", 2L, 1L), ("k2", 20L, 2L)), // in-chunk dup
    Seq(("k2", 200L, 3L), ("k3", 3L, 1L)),
    Seq(("k1", 100L, 9L), ("k4", 4L, 1L)))

  private def tmpSink(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_merge_$tag").toString + "/s"

  test("delta-log fold reproduces sequential upsertParquet exactly (both modes)") {
    for (mode <- Seq(Merge.Ignore, Merge.Update)) {
      val seqPath = tmpSink("seq")
      val lsmPath = tmpSink("lsm")
      chunks3.foreach { c =>
        Merge.upsertParquet(spark, seqPath, c.toDF("_key", "val", "ver"),
          "_key", mode, "ver")
        Merge.appendDelta(spark, lsmPath, c.toDF("_key", "val", "ver"))
      }
      Merge.finalizeDeltas(spark, lsmPath, "_key", mode, "ver")
      val seq = spark.read.parquet(seqPath)
        .as[(String, Long, Long)].collect().toSet
      val lsm = spark.read.parquet(lsmPath)
        .as[(String, Long, Long)].collect().toSet
      assert(lsm == seq, s"mode $mode diverged")
      assert(Merge.pendingDeltas(spark, lsmPath).isEmpty)
    }
  }

  test("delta-log: replayed chunks (crashed-epoch orphans) resolve to the same state") {
    val once = tmpSink("once")
    val replay = tmpSink("replay")
    chunks3.foreach(c => Merge.appendDelta(spark, once, c.toDF("_key", "val", "ver")))
    Merge.finalizeDeltas(spark, once, "_key", Merge.Ignore, "ver")
    // crash after appends, before finalize: the epoch re-runs from the
    // checkpoint and re-appends everything on top of the orphans
    chunks3.foreach(c => Merge.appendDelta(spark, replay, c.toDF("_key", "val", "ver")))
    chunks3.foreach(c => Merge.appendDelta(spark, replay, c.toDF("_key", "val", "ver")))
    Merge.finalizeDeltas(spark, replay, "_key", Merge.Ignore, "ver")
    assert(spark.read.parquet(replay).as[(String, Long, Long)].collect().toSet ==
      spark.read.parquet(once).as[(String, Long, Long)].collect().toSet)
  }

  test("delta-log: torn appends are invisible; 'delta-' in the sink path is harmless") {
    // a path that itself contains "delta-1" must not confuse numbering
    val base = java.nio.file.Files.createTempDirectory("graft_delta-1_x").toString
    val path = base + "/delta-1/s"
    Merge.appendDelta(spark, path, Seq(("k1", 1L, 1L)).toDF("_key", "val", "ver"))
    Merge.appendDelta(spark, path, Seq(("k2", 2L, 1L)).toDF("_key", "val", "ver"))
    assert(Merge.pendingDeltas(spark, path).size == 2)
    // simulate a torn write: an abandoned tmp dir with garbage inside
    val torn = new java.io.File(path + ".deltas/.tmp-dead")
    torn.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(torn.toString, "part-0.parquet"), "not parquet")
    assert(Merge.pendingDeltas(spark, path).size == 2, "torn tmp dir leaked in")
    Merge.finalizeDeltas(spark, path, "_key", Merge.Ignore, "ver")
    val state = spark.read.parquet(path)
      .select("_key", "val").as[(String, Long)].collect().toMap
    assert(state == Map("k1" -> 1L, "k2" -> 2L))
  }

  test("delta-log: a sink column named __delta_seq0 survives the fold") {
    val path = tmpSink("seqcol")
    val df = Seq(("k1", 7L, 1L)).toDF("_key", "__delta_seq0", "ver")
    Merge.appendDelta(spark, path, df)
    Merge.finalizeDeltas(spark, path, "_key", Merge.Ignore, "ver")
    val r = spark.read.parquet(path).select("_key", "__delta_seq0")
      .as[(String, Long)].collect().head
    assert(r == (("k1", 7L)))
  }

  test("partitioned sink: partially-covered buckets merge instead of clobbering") {
    val path = tmpSink("hb")
    def chunk(rows: Seq[(String, Long, Long)]) =
      Merge.upsertPartitionedByHeight(spark, path,
        rows.toDF("_key", "h", "ver"), "_key", Merge.Ignore, "ver",
        heightCol = "h", bucketWidth = 10L)
    chunk(Seq(("a", 3L, 1L), ("b", 14L, 1L)))  // buckets 0 and 1 (partial)
    chunk(Seq(("c", 17L, 1L), ("d", 25L, 1L))) // bucket 1 AGAIN + bucket 2
    val state = spark.read.parquet(path)
      .select("_key", "h").as[(String, Long)].collect().toSet
    // the second chunk must NOT wipe b (bucket 1's earlier row)
    assert(state == Set(("a", 3L), ("b", 14L), ("c", 17L), ("d", 25L)))
    // replaying chunk 2 is a no-op (first-write-wins on merge)
    chunk(Seq(("c", 17L, 9L), ("d", 25L, 9L)))
    val replayed = spark.read.parquet(path)
      .select("_key", "ver").as[(String, Long)].collect().toMap
    assert(replayed("c") == 1L && replayed("d") == 1L)
  }

  test("partitioned sink: untouched partitions are not rewritten") {
    val path = tmpSink("hb2")
    def files(b: Long) = {
      val dir = new java.io.File(s"$path/__hb=$b")
      if (!dir.exists()) Map.empty[String, Long]
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    Merge.upsertPartitionedByHeight(spark, path,
      Seq(("a", 5L, 1L)).toDF("_key", "h", "ver"), "_key", Merge.Ignore,
      "ver", "h", 10L)
    val bucket0 = files(0L)
    assert(bucket0.nonEmpty)
    Thread.sleep(1100) // mtime granularity
    Merge.upsertPartitionedByHeight(spark, path,
      Seq(("z", 95L, 1L)).toDF("_key", "h", "ver"), "_key", Merge.Ignore,
      "ver", "h", 10L)
    assert(files(0L) == bucket0, "bucket 0 was rewritten by a bucket-9 chunk")
    assert(files(9L).nonEmpty)
  }

  test("partitioned sink: the existing-side read prunes statically, no cast") {
    // upsertPartitionedByHeight computes __hb as LONG on the incoming side
    // but parquet partition-column INFERENCE reads it back as int — the
    // isin prune would then run through cast(__hb as bigint) and static
    // pruning would rest on UnwrapCastInBinaryComparison. The fix passes
    // the incoming schema to the read; this pins the resulting plan: the
    // partition filter is a bare In on a long __hb, never a cast.
    val path = tmpSink("hbprune")
    val inc = Seq(("a", 5L, 1L), ("z", 95L, 1L)).toDF("_key", "h", "ver")
    Merge.upsertPartitionedByHeight(spark, path, inc, "_key", Merge.Ignore,
      "ver", "h", 10L)
    val schema = inc.withColumn("__hb", expr("h div 10L")).schema
    val read = spark.read.schema(schema).parquet(path)
      .filter(col("__hb").isin(0L))
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the plan"))
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("__hb"), s"partition filter missing: $pf")
    assert(!pf.toLowerCase.contains("cast"),
      s"partition filter runs through a cast — static pruning fragile: $pf")
    // and the pruned read returns exactly bucket 0's row
    assert(read.select("_key").as[String].collect().toSeq == Seq("a"))
  }

  test("delta-log: a second epoch folds on top of the finalized base") {
    val path = tmpSink("epochs")
    Merge.appendDelta(spark, path, Seq(("k1", 1L, 1L)).toDF("_key", "val", "ver"))
    Merge.finalizeDeltas(spark, path, "_key", Merge.Ignore, "ver")
    Merge.appendDelta(spark, path,
      Seq(("k1", 99L, 9L), ("k2", 2L, 1L)).toDF("_key", "val", "ver"))
    Merge.finalizeDeltas(spark, path, "_key", Merge.Ignore, "ver")
    val state = spark.read.parquet(path)
      .select("_key", "val").as[(String, Long)].collect().toMap
    // Ignore: the epoch-1 base wins for k1; k2 inserts
    assert(state == Map("k1" -> 1L, "k2" -> 2L))
  }
}
