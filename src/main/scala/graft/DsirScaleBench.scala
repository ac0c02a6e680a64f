package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir
import graft.sources.Records

/** The p17/p17b DSIR wing, measured at scale: model fit (two scans
  * ending in 4096-bucket-bounded aggregations — target is the src0
  * slice, raw the rest), scoring (ONE raw-pool scan with the in-row
  * log-ratio fold against the dense array literal — zero shuffle, no
  * join), and the Gumbel top-k resample from the materialized scored
  * relation (TakeOrderedAndProject). The claim under test: fit cost is
  * two corpus scans, score cost one, resample cost one narrow-relation
  * scan — all ~linear in docs with no state beyond the 4096-double
  * literal. One JSON line per phase:
  * `{"metric":"dsir_scale","phase":…,"docs":n,"sec":…}`.
  *
  * Usage: DsirScaleBench <sfDir>
  */
object DsirScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-dsir-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val raw0 = Records.table(spark, sfDir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs = if (raw0.rdd.getNumPartitions < par) raw0.repartition(par)
      else raw0
    val n = docs.count()
    val target = docs.filter(col("source") === "src0")
    val pool = docs.filter(col("source") =!= "src0")

    val t0 = System.nanoTime()
    val lr = Dsir.importanceLogRatios(target, pool, buckets = 4096)
    val fitSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"dsir_scale","phase":"fit",""" +
      f""""docs":$n,"sec":$fitSec%.2f,"sf":"$sfDir"}""")

    // the p17c lever: raw model from a 1/16 digest-gated subsample
    val t0b = System.nanoTime()
    Dsir.importanceLogRatios(target, pool, buckets = 4096,
      rawSampleMod = 16)
    val fitSampledSec = (System.nanoTime() - t0b) / 1e9
    println(f"""{"metric":"dsir_scale","phase":"fit_sampled_16",""" +
      f""""docs":$n,"sec":$fitSampledSec%.2f,"sf":"$sfDir"}""")

    // score once, materialized (the production shape: one scored
    // relation, many downstream resamples/thresholds read it)
    val tmp = graft.SessionTemp.dir("graft_dsir_scale_")
    val t1 = System.nanoTime()
    Dsir.importanceWeights(pool, lr)
      .write.mode("overwrite").parquet(tmp)
    val scoreSec = (System.nanoTime() - t1) / 1e9
    val scored = spark.read.parquet(tmp)
    val agg = scored.agg(count(lit(1)), avg("logw")).head()
    println(f"""{"metric":"dsir_scale","phase":"score",""" +
      f""""docs":$n,"sec":$scoreSec%.2f,"rows":${agg.getLong(0)},""" +
      f""""avg_logw":${agg.getDouble(1)}%.4f,"sf":"$sfDir"}""")

    val k = math.max(1000L, n / 100L).toInt
    val t2 = System.nanoTime()
    val got = Dsir.gumbelResample(scored, k = k)
      .agg(count(lit(1))).head().getLong(0)
    val resampleSec = (System.nanoTime() - t2) / 1e9
    println(f"""{"metric":"dsir_scale","phase":"resample",""" +
      f""""docs":$n,"sec":$resampleSec%.2f,"k":$k,"rows":$got,""" +
      f""""sf":"$sfDir"}""")
    spark.stop()
  }
}
