package graft.sources

import java.nio.file.Files
import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Tables.normalizeEventTs]]'s three-way encoding dispatch (long-ns
  * legacy, TIMESTAMP_NTZ micros, TIMESTAMP micros) to identical long-ns
  * output, its independence from `spark.sql.session.timeZone`, and the
  * native-typed range pushdown of [[Tables.eventsExclusiveRangeUs]].
  * (Advice r10: the NTZ branch previously cast through the session zone —
  * correct only under UTC — and the computed `ts` column defeated parquet
  * pushdown on time-range scans.)
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Three instants spanning the q02-style window, exact to the µs.
  private val usValues = Seq(
    1704672000000000L,           // 2024-01-08T00:00:00Z
    1705000000123456L,           // mid-window, sub-second µs
    1705881599999999L)           // 1 µs before 2024-01-22T00:00:00Z
  private val nsValues = usValues.map(_ * 1000L)

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"tables-$tag").toString

  /** Write events.parquet under `dir` with the given ts encoding; returns
    * the dir (so [[Tables.apply]]/[[Tables.eventsExclusiveRangeUs]] can
    * read it like driver testdata).
    */
  private def writeEncoded(encoding: String): String = {
    val dir = tmpDir(encoding)
    val rows = usValues.zipWithIndex.map { case (us, i) =>
      val ts: Any = encoding match {
        case "long" => us * 1000L
        case "ntz" => LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
          ZoneOffset.UTC)
        case "tz" => Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      }
      Row(ts, s"e$i", i.toLong)
    }
    val tsType: DataType = encoding match {
      case "long" => LongType
      case "ntz" => TimestampNTZType
      case "tz" => TimestampType
    }
    val schema = StructType(Seq(
      StructField("ts", tsType), StructField("event_type", StringType),
      StructField("value", LongType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readNormalized(dir: String): Seq[Long] =
    Tables(spark, dir, "events").select("ts").as[Long].collect().sorted.toSeq

  test("all three ts encodings normalize to identical long-ns values") {
    for (enc <- Seq("long", "ntz", "tz")) {
      val got = readNormalized(writeEncoded(enc))
      assert(got == nsValues, s"encoding $enc drifted: $got vs $nsValues")
    }
  }

  test("normalization is independent of spark.sql.session.timeZone") {
    val dirs = Seq("ntz", "tz").map(e => e -> writeEncoded(e))
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      for (tz <- Seq("America/New_York", "Asia/Tokyo")) {
        spark.conf.set(tzKey, tz)
        for ((enc, dir) <- dirs) {
          val got = readNormalized(dir)
          assert(got == nsValues,
            s"encoding $enc drifted under session zone $tz: $got vs $nsValues")
        }
      }
    } finally spark.conf.set(tzKey, saved)
  }

  test("eventsExclusiveRangeUs pushes a native ts predicate to the scan and bounds are exclusive") {
    // window excluding the first and last row exactly (exclusive ends)
    val lo = usValues.head
    val hi = usValues.last
    for (enc <- Seq("long", "ntz", "tz")) {
      val dir = writeEncoded(enc)
      val ranged = Tables.eventsExclusiveRangeUs(spark, dir, lo, hi)
      assert(ranged.select("ts").as[Long].collect().toSeq ==
        Seq(usValues(1) * 1000L), s"encoding $enc: wrong rows")
      // equivalent to filtering AFTER normalization
      val post = Tables(spark, dir, "events")
        .filter(expr("ts div 1000") > lo && expr("ts div 1000") < hi)
        .select("ts").as[Long].collect().toSeq
      assert(ranged.select("ts").as[Long].collect().toSeq == post)
      // and the raw-column predicate reached the parquet scan (timestamp
      // encodings; the legacy long-ns read of TIMESTAMP(NANOS) data has no
      // pushdown contract — the engine's own long write here does)
      val scan = ranged.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail(s"encoding $enc: no FileSourceScanExec"))
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("ts"),
        s"encoding $enc: no pushed ts filter — PushedFilters=$pushed")
      assert(pushed != "[]", s"encoding $enc: empty PushedFilters")
    }
  }
}
