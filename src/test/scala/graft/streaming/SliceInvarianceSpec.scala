package graft.streaming

import graft.{SparkTestSession, SplitEventsByTime}
import graft.queries.Catalog
import org.scalatest.funsuite.AnyFunSuite

/** The streaming entries accept two fixture layouts: the driver's
  * single `events.parquet` (one micro-batch — all state resident, the
  * degenerate worst case) and the time-sliced layout SplitEventsByTime
  * writes (one file per micro-batch — the watermark advances BETWEEN
  * batches and state evicts, the production arrival shape the sliced
  * sf30 bench measures). The DuckDB gate only sees the single-file
  * layout, so this spec pins the other half: slicing must be INVISIBLE
  * in the results — multi-batch watermark advancement may only change
  * WHEN state evicts, never what is emitted. A divergence here means a
  * watermark dropped rows as late (slices are time-ordered, so nothing
  * should ever be late) or cross-batch state was lost. */
class SliceInvarianceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sfDir = SparkTestSession.sfDir

  private lazy val slicedDir: String = {
    val out = java.nio.file.Files.createTempDirectory("graft_sliced_").toString
    SplitEventsByTime.split(spark, sfDir, out, 4)
    out
  }

  private def rows(name: String, dir: String): Seq[String] =
    Catalog.byName(name).fn(spark, dir).collect().map(_.toString).toSeq

  for (q <- Seq("e3_watermarked_windows", "e4_stream_sessions",
      "e6_stream_funnel", "e7_stream_join"))
    test(s"$q: 4-slice arrival emits exactly the single-batch result") {
      val sliced = rows(q, slicedDir)
      val single = rows(q, sfDir)
      assert(sliced === single,
        s"slice-variant output: ${sliced.size} vs ${single.size} rows")
    }
}
