package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (getOrCreate — cheap after the
  * first suite; sbt forks a single test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("4")
}
