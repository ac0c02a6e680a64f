package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    // A shell redirection token passed unquoted as the outDir argument once
    // created a literal "2>/dev/null" directory tree; fail fast on anything
    // that looks like a redirect or option rather than a real path.
    require(
      !outDir.exists(c => c == '>' || c == '<' || c == '|') && !outDir.startsWith("-"),
      s"suspicious outDir '$outDir' — looks like a shell redirect/option, not a path")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local("graft-verify", cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape (single shared implementation, property-tested
    // in ModelProps) — a tab or CR in builder-authored SQL would
    // otherwise make the driver's json.load fail and silently zero the
    // round's correctness.
    def q(s: String): String = graft.streaming.PipelineManager.jsonEscape(s)
    // Per-entry attempt manifest: one row for EVERY catalog entry this run
    // attempted, ok or failed. A failed entry used to only print to stderr,
    // so an entry whose output never materialized could silently vanish
    // from the downstream comparison (round 14: k2d_group_retention was
    // absent from the 142-key artifact while the catalog had 143 and
    // nothing noticed). tools/check.py refuses to pass unless this
    // manifest exists, covers the full catalog, and is all-ok.
    val attempted = scala.collection.mutable.LinkedHashMap[String, Option[String]]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        attempted(name) = None
      } catch { case e: Throwable =>
        attempted(name) = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}".take(400))
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val manifest = attempted.map { case (name, err) =>
      val body = err match {
        case None    => "{\"ok\": true}"
        case Some(m) => s"""{"ok": false, "error": ${q(m)}}"""
      }
      s"${q(name)}: $body"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
