package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property pin for [[Merge.healSwap]]: simulate a `commitSwap(A → B)`
  * crashed at EVERY interleaving point (plus accumulated garbage from
  * earlier crashes), heal, and assert the target reads EXACTLY A or
  * EXACTLY B — never a mix, never absent — with every stray sibling
  * swept and the heal idempotent. The crash points, from commitSwap's
  * actual statement order (write tmp → rename target→old → rename
  * tmp→target → delete old):
  *
  *  - `p0`  crash after the tmp write: target A intact, complete tmp(B)
  *  - `p0i` crash DURING the tmp write: target A intact, tmp w/o _SUCCESS
  *  - `p1`  crash between the renames: target ABSENT, old(A), tmp(B)
  *          complete → heal must FINISH the swap (B)
  *  - `p1i` same window but the tmp never finished (double crash):
  *          heal must RESTORE the pre-swap state (A)
  *  - `p2`  crash before `delete old`: target B intact, old(A) stray
  */
class HealSwapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeVals(path: String, vals: Seq[Long]): Unit = {
    import spark.implicits._
    vals.toDF("v").repartition(1).write.parquet(path)
  }

  private def readVals(path: String): Seq[Long] = {
    import spark.implicits._
    spark.read.parquet(path).as[Long].collect().toSeq.sorted
  }

  test("property: heal after ANY crash point (with prior-crash garbage) " +
    "lands exactly old-state or new-state, sweeps strays, and is idempotent") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val points = Seq("p0", "p0i", "p1", "p1i", "p2")
    val caseGen = for {
      point <- Gen.oneOf(points)
      a <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 99L))
      b <- Gen.nonEmptyListOf(Gen.chooseNum(100L, 199L))
      // garbage from EARLIER crashed swaps that never got swept
      junkOld <- Gen.chooseNum(0, 2)
      junkTmp <- Gen.chooseNum(0, 2)
    } yield (point, a.distinct.sorted, b.distinct.sorted, junkOld, junkTmp)
    val prop = Prop.forAll(caseGen) { case (point, a, b, junkOld, junkTmp) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-healswap")
        .toFile.getAbsolutePath
      val target = s"$dir/reg"
      val fs = fsOf(target)
      def p(s: String) = new org.apache.hadoop.fs.Path(s)
      // prior-crash garbage: stale olds (ancient states) and an
      // INCOMPLETE stale tmp — none of it may win over this swap's
      // artifacts, all of it must be gone after the heal.
      // Filesystem mtime granularity can be 1s, so stale-vs-current
      // ordering is enforced explicitly rather than by sleep.
      (0 until junkOld).foreach { i =>
        writeVals(s"$target.old-junk$i", Seq(-1L - i))
        fs.setTimes(p(s"$target.old-junk$i"), 1000L + i, -1)
      }
      (0 until junkTmp).foreach { i =>
        writeVals(s"$target.tmp-junk$i", Seq(-10L - i))
        fs.delete(p(s"$target.tmp-junk$i/_SUCCESS"), false)
        fs.setTimes(p(s"$target.tmp-junk$i"), 1000L + i, -1)
      }
      // the crashed swap A→B, frozen at `point`
      point match {
        case "p0" =>
          writeVals(target, a); writeVals(s"$target.tmp-x", b)
        case "p0i" =>
          writeVals(target, a); writeVals(s"$target.tmp-x", b)
          fs.delete(p(s"$target.tmp-x/_SUCCESS"), false)
        case "p1" =>
          writeVals(s"$target.old-x", a); writeVals(s"$target.tmp-x", b)
        case "p1i" =>
          writeVals(s"$target.old-x", a); writeVals(s"$target.tmp-x", b)
          fs.delete(p(s"$target.tmp-x/_SUCCESS"), false)
        case "p2" =>
          writeVals(target, b); writeVals(s"$target.old-x", a)
      }
      val healed = Merge.healSwap(spark, target)
      val expectRestore = point == "p1" || point == "p1i"
      val expected = point match {
        case "p0" | "p0i" | "p1i" => a
        case "p1" | "p2" => b
      }
      val stateOk = readVals(target) == expected
      val strays = fs.listStatus(p(dir))
        .map(_.getPath.getName).filter(_ != "reg")
      val sweptOk = strays.isEmpty
      val returnOk = healed == expectRestore
      // idempotent: a second heal is a no-op on the intact target
      val again = Merge.healSwap(spark, target)
      val idemOk = !again && readVals(target) == expected
      if (!(stateOk && sweptOk && returnOk && idemOk))
        println(s"[healswap] $point a=$a b=$b junk=($junkOld,$junkTmp) " +
          s"state=${readVals(target)} strays=${strays.toList} " +
          s"healed=$healed again=$again")
      stateOk && sweptOk && returnOk && idemOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
