package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds. Sized for the
  * local[32] harness (32 shuffle partitions — matches core count; AQE
  * coalesces further at runtime).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen once on the smallest sf so per-query numbers
    // measure the plan, not first-call classloading
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    // optional query-name filter (scale-stress runs bench a SUBSET on a
    // generated fixture dir that only has the doc/emb/events tables);
    // the driver's no-arg invocation still runs everything
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // noop sink materializes every row — top-level sorts and projections
    // are paid, unlike count() which lets Catalyst prune them
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // a failed query's time-to-failure must never read as a speedup
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    // The harness keeps only a ~2000-char tail of this process's output,
    // and the full per-query line above outgrows it (the JSON gets cut
    // mid-line and never parses). Emit a second, compact line LAST —
    // total + the slowest queries — that always fits inside the tail.
    val slowest = results.sortBy(-_._2).take(12)
      .map { case (k, v, _) => "\"" + k + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$slowest,"n_queries":${results.size},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
