package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (per-suite sessions
  * would pay ~5 s of JVM/Spark startup each). */
object TestSpark {
  lazy val spark: SparkSession = Tables.localSession("graft-test", 4)
  val Sf: String = "/root/testdata/sf0.001"
}
