package graft

/** Plan inspector: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan (post-AQE where applicable) for one catalog
  * entry — the fastest way to audit pushdown/exchange/codegen shape
  * without running the driver bench. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.Catalog.byName(name).fn(spark, sfDir)
    df.explain("formatted")
    if (sys.env.get("GRAFT_EXPLAIN_RUN").contains("1")) {
      df.write.format("noop").mode("overwrite").save()
      println("=== post-execution (AQE-final) ===")
      df.explain("formatted")
    }
    spark.stop()
  }
}
