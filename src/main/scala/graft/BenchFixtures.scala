package graft

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.SparkSession

/** Shared bench-fixture plumbing: the scale fixtures ship `documents`
  * as ONE parquet file, but the streaming modules' file source
  * (`maxFilesPerTrigger = 1`, glob `documents*.parquet`) needs one
  * file per desired micro-batch — slice the corpus into `slices`
  * renamed part files under a session-temp dir. */
object BenchFixtures {

  /** Returns the sliced dir (session-temp; cleaned at exit). */
  def sliceDocs(spark: SparkSession, docsDir: String, slices: Int,
      prefix: String = "bench_docs_"): String = {
    val sliced = SessionTemp.dir(prefix)
    graft.sources.Records.table(spark, docsDir, "documents")
      .repartition(slices)
      .write.mode("overwrite").parquet(s"$sliced/_parts")
    val parts = new java.io.File(s"$sliced/_parts").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(f"$sliced/documents-$i%03d.parquet"))
    }
    FileUtils.deleteDirectory(new java.io.File(s"$sliced/_parts"))
    sliced
  }
}
