package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Broadcasts.sizeGated]]'s STRUCTURAL counting contract (the
  * round-17 advice: the gate's count() must never silently re-run a
  * derived frame's full computation): bare scans count from metadata,
  * derived frames are rejected unless the caller supplies the row
  * count (or an upper bound), and the hint itself gates on the
  * ceiling in both paths. */
class BroadcastsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.nonEmpty

  private def scanDf() = {
    import spark.implicits._
    val tmp = graft.SessionTemp.dir("broadcasts_spec_")
    (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
      .write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
  }

  test("bare scan: hinted at or below the ceiling, plain above it") {
    val df = scanDf()
    assert(hinted(Broadcasts.sizeGated(df, maxRows = 10L)))
    assert(!hinted(Broadcasts.sizeGated(df, maxRows = 9L)))
    // pruning projections and aliases over the scan still qualify
    assert(hinted(Broadcasts.sizeGated(df.select("k").as("x"),
      maxRows = 10L)))
  }

  test("derived frame without knownRows fails loudly") {
    val df = scanDf()
    val derived = df.filter(org.apache.spark.sql.functions.col("k") > 2L)
    val e = intercept[IllegalArgumentException] {
      Broadcasts.sizeGated(derived)
    }
    assert(e.getMessage.contains("knownRows"))
    val agg = df.groupBy("v").count()
    intercept[IllegalArgumentException] { Broadcasts.sizeGated(agg) }
  }

  test("knownRows gates a derived frame with zero counting jobs") {
    val df = scanDf()
    val derived = df.filter(org.apache.spark.sql.functions.col("k") > 2L)
    assert(hinted(Broadcasts.sizeGated(derived, maxRows = 100L,
      knownRows = 8L)))
    assert(!hinted(Broadcasts.sizeGated(derived, maxRows = 7L,
      knownRows = 8L)))
    // knownRows is trusted as an upper bound — no job runs, so even a
    // frame whose true count is below the ceiling stays plain when the
    // supplied bound is above it (the conservative direction)
    assert(!hinted(Broadcasts.sizeGated(derived, maxRows = 7L,
      knownRows = 1000L)))
  }
}
