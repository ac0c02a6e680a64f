package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run (sessions are
  * expensive; suites must not stop() it). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.local("graft-test", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Smallest fixture dir — tests stay fast. */
  val sfDir = "/root/testdata/sf0.001"
}
