package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TieredJsonSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lang", StringType),
    StructField("score", DoubleType)))

  private def rows(ids: Range) =
    ids.map(i => (i.toLong, if (i % 2 == 0) "en" else "de", i * 0.5))
      .toDF("id", "lang", "score")

  private def freshDir() = Files.createTempDirectory("graft_tiered").toString

  private def readIds(dir: String): Seq[Long] =
    TieredJsonSink.read(spark, dir, schema).select("id").as[Long]
      .collect().sorted.toSeq

  private def jsonlFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).toSeq

  test("append → compact → append → read sees base ∪ tail; re-compact absorbs") {
    val dir = freshDir()
    TieredJsonSink.append(rows(0 until 10), dir)
    assert(readIds(dir) == (0L until 10L)) // pure tail, no base yet
    assert(TieredJsonSink.compact(spark, dir, schema) == 10L)
    assert(jsonlFiles(dir).isEmpty, "absorbed tail files must be GC'd")
    assert(readIds(dir) == (0L until 10L)) // pure base
    TieredJsonSink.append(rows(10 until 15), dir)
    assert(readIds(dir) == (0L until 15L)) // base ∪ tail
    assert(TieredJsonSink.compact(spark, dir, schema) == 15L) // iterative
    assert(readIds(dir) == (0L until 15L))
    // old base dirs swept, exactly one committed base remains
    val bases = new java.io.File(dir).listFiles().filter(_.getName.startsWith("_base-"))
    assert(bases.length == 1)
  }

  test("empty sink and no-new-data compactions are no-ops") {
    val dir = freshDir()
    assert(TieredJsonSink.compact(spark, dir, schema) == -1L)
    TieredJsonSink.append(rows(0 until 4), dir)
    assert(TieredJsonSink.compact(spark, dir, schema) == 4L)
    assert(TieredJsonSink.compact(spark, dir, schema) == 4L) // idempotent
    assert(readIds(dir) == (0L until 4L))
  }

  test("crash before manifest: a manifest-less base dir is invisible") {
    val dir = freshDir()
    TieredJsonSink.append(rows(0 until 6), dir)
    TieredJsonSink.compact(spark, dir, schema)
    TieredJsonSink.append(rows(6 until 9), dir)
    // Simulate a compaction that wrote its parquet but died pre-commit:
    // parquet data at the next index, no _MANIFEST.json.
    rows(100 until 200).write.mode("overwrite").parquet(s"$dir/_base-1")
    assert(readIds(dir) == (0L until 9L)) // still the old snapshot
    // The next compact claims index 2, commits, and sweeps the partial.
    assert(TieredJsonSink.compact(spark, dir, schema) == 9L)
    assert(readIds(dir) == (0L until 9L))
    assert(!new java.io.File(s"$dir/_base-1").exists())
  }

  test("crash after manifest before GC: absorbed-but-undeleted tail never double-counts") {
    val dir = freshDir()
    TieredJsonSink.append(rows(0 until 8), dir)
    val tail = jsonlFiles(dir)
    TieredJsonSink.compact(spark, dir, schema)
    // Resurrect an absorbed tail file (as if GC died mid-sweep): its name
    // is in the manifest, so the tiered read must exclude it.
    val ghost = rows(0 until 8).coalesce(1) // exactly one file to rename
    ghost.write.format("jsonlines").mode("append").save(dir)
    val added = jsonlFiles(dir)
    // rename the fresh file to the ABSORBED name → simulates the undeleted original
    val src = new java.io.File(dir, added.head)
    assert(src.renameTo(new java.io.File(dir, tail.head)))
    assert(readIds(dir) == (0L until 8L), "manifest must shadow the ghost file")
    // and the next compact finishes the interrupted GC
    assert(TieredJsonSink.compact(spark, dir, schema) == 8L)
    assert(jsonlFiles(dir).isEmpty)
  }

  test("include pin fails loudly when a named file vanished") {
    val dir = freshDir()
    TieredJsonSink.append(rows(0 until 4), dir)
    val name = jsonlFiles(dir).head
    val df = spark.read.format("jsonlines").schema(schema)
      .option("include", s"$name,not-there.jsonl").load(dir)
    val e = intercept[Exception](df.count())
    assert(e.getMessage.contains("not-there.jsonl") ||
      Option(e.getCause).exists(_.getMessage.contains("not-there.jsonl")))
  }

  test("filters and pruning push into both branches of the tiered read") {
    val dir = freshDir()
    TieredJsonSink.append(rows(0 until 20), dir)
    TieredJsonSink.compact(spark, dir, schema)
    TieredJsonSink.append(rows(20 until 30), dir)
    val q = TieredJsonSink.read(spark, dir, schema)
      .filter(col("lang") === "en").select("id")
    assert(q.as[Long].collect().sorted.toSeq == (0L until 30L by 2))
    // parquet rides the v1 path (FileSourceScanExec), jsonlines is v2
    val plan = q.queryExecution.executedPlan
    val v2 = plan.collect { case s: BatchScanExec => s }
    val v1 = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(v2.length == 1 && v1.length == 1,
      s"expected one jsonlines + one parquet scan, got v2=${v2.length} v1=${v1.length}")
    assert(v2.head.scan.description().contains("lang"),
      "filter must push into the jsonlines parser")
    assert(v1.head.metadata("PushedFilters").contains("lang"),
      "filter must push into the parquet scan")
  }

  test("torture: two interleaved appenders race a compaction loop; no row lost or doubled") {
    // Verdict r10 item 9. Two writer threads append disjoint id batches
    // while the single maintainer (this thread — the documented regime)
    // compacts repeatedly and reads between compactions. Pinned:
    //  - ACKNOWLEDGED rows are always readable (an append that returned
    //    before a read started is in that read, whether it sits in the
    //    tail, was include-pinned into a base mid-loop, or landed between
    //    the compaction's file listing and its manifest commit);
    //  - no read ever sees a duplicate (the exclude pin: absorbed files
    //    never double-count against the base that holds their rows);
    //  - after quiescing + a final compact, the sink is exactly the
    //    union of everything appended, the tail is empty, and exactly
    //    one committed base remains.
    val dir = freshDir()
    val acked1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val acked2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def appender(base: Long, acked: java.util.concurrent.ConcurrentLinkedQueue[Long]) =
      new Thread(() => {
        try {
          for (b <- 0 until 6) {
            val ids = (base + b * 10) until (base + b * 10 + 10)
            TieredJsonSink.append(rows(ids.head.toInt until (ids.last.toInt + 1)), dir)
            ids.foreach(i => acked.add(i))
          }
        } catch { case t: Throwable => failed.set(t) }
      })
    val t1 = appender(1000L, acked1)
    val t2 = appender(2000L, acked2)
    t1.start(); t2.start()
    while (t1.isAlive || t2.isAlive) {
      // snapshot BEFORE the read: these rows were acknowledged, so the
      // read that starts now must contain every one of them
      val mustSee = (acked1.toArray(Array.empty[java.lang.Long]) ++
        acked2.toArray(Array.empty[java.lang.Long])).map(_.longValue()).toSet
      TieredJsonSink.compact(spark, dir, schema)
      val seen = readIds(dir)
      assert(seen.distinct == seen, s"duplicate rows in concurrent read")
      val missing = mustSee -- seen.toSet
      assert(missing.isEmpty, s"acknowledged rows missing from read: $missing")
    }
    assert(failed.get() == null, s"appender failed: ${failed.get()}")
    t1.join(); t2.join()
    TieredJsonSink.compact(spark, dir, schema)
    val everything = ((1000L until 1060L) ++ (2000L until 2060L)).sorted
    assert(readIds(dir) == everything)
    assert(jsonlFiles(dir).isEmpty, "final compact must absorb the whole tail")
    val bases = new java.io.File(dir).listFiles().filter(_.getName.startsWith("_base-"))
    assert(bases.length == 1, "older bases must be GC'd")
    // one more append after the final compact stays readable live tail
    // (the exclude path against the committed manifest)
    TieredJsonSink.append(rows(3000 until 3005), dir)
    assert(readIds(dir) == (everything ++ (3000L until 3005L)).sorted)
  }
}
