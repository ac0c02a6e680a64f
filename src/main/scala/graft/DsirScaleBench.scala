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
  * With a second argument `sweep`, adds the bucket-count robustness
  * phase (the adaptiveBits discipline applied to DSIR's one free
  * parameter): fit + score at B ∈ {1024, 16384} and report each
  * against the 4096 default — Pearson correlation of per-doc logw and
  * the overlap of the top-k-by-logw sets — so the bucket-count
  * default is a measured choice, not a constant.
  *
  * Usage: DsirScaleBench <sfDir> [sweep]
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

    // `stream`: the p17d maintenance-cost phase — slice the corpus
    // into 16 micro-batches, maintain the raw bucket-count model
    // incrementally (IncrementalDsir, bucket-bounded partials), then
    // emit one accumulated resample, and compare the whole streaming
    // path to the pure-batch fit+score+resample wall. The claim under
    // test: incremental model maintenance adds only per-batch
    // partial-write overhead — the consumed resample costs the same
    // one scoring scan either way, and the model read is state-sized.
    if (args.length > 1 && args(1) == "stream") {
      val sliced = BenchFixtures.sliceDocs(spark, sfDir, 16,
        "dsir_stream_docs_")
      val work = SessionTemp.dir("dsir_stream_work_")
      val t3 = System.nanoTime()
      graft.streaming.IncrementalDsir.run(spark, sliced, work,
        buckets = 4096)
      val runSec = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val sk = math.max(1000L, n / 100L).toInt
      val rows = graft.streaming.IncrementalDsir.resampleAccumulated(
          spark, work, target, pool, k = sk)
        .agg(count(lit(1))).head().getLong(0)
      val resSec = (System.nanoTime() - t4) / 1e9
      // batch baseline over the same corpus, end to end
      val t5 = System.nanoTime()
      val blr = Dsir.importanceLogRatios(target, pool, buckets = 4096)
      Dsir.gumbelResample(
          Dsir.importanceWeights(pool, blr)
            .select(col("doc_id"), col("logw")), k = sk)
        .agg(count(lit(1))).head().getLong(0)
      val batchSec = (System.nanoTime() - t5) / 1e9
      println(f"""{"metric":"dsir_scale","phase":"stream",""" +
        f""""docs":$n,"batches":16,"stream_run_sec":$runSec%.2f,""" +
        f""""stream_resample_sec":$resSec%.2f,"rows":$rows,""" +
        f""""batch_total_sec":$batchSec%.2f,"k":$sk,"sf":"$sfDir"}""")
    }

    if (args.length > 1 && args(1) == "sweep") {
      val base = scored.select(col("doc_id"), col("logw"))
      val baseTop = base.orderBy(desc("logw"), col("doc_id")).limit(k)
        .select("doc_id")
      for (b <- Seq(1024, 16384)) {
        val t = System.nanoTime()
        val lrB = Dsir.importanceLogRatios(target, pool, buckets = b)
        val tmpB = graft.SessionTemp.dir(s"graft_dsir_b${b}_")
        Dsir.importanceWeights(pool, lrB)
          .select(col("doc_id"), col("logw").as("logw_b"))
          .write.mode("overwrite").parquet(tmpB)
        val sec = (System.nanoTime() - t) / 1e9
        val sb = spark.read.parquet(tmpB)
        // corr() is NULL on zero variance / empty join — record NaN
        // rather than dying after the fit+score was already paid
        val cRow = base.join(sb, "doc_id")
          .agg(corr(col("logw"), col("logw_b"))).head()
        val c = if (cRow.isNullAt(0)) Double.NaN else cRow.getDouble(0)
        val overlap = baseTop
          .join(sb.orderBy(desc("logw_b"), col("doc_id")).limit(k)
            .select("doc_id"), "doc_id")
          .count()
        println(f"""{"metric":"dsir_scale","phase":"bucket_sweep",""" +
          f""""buckets":$b,"docs":$n,"sec":$sec%.2f,""" +
          f""""corr_vs_4096":$c%.4f,""" +
          f""""topk_overlap":${overlap.toDouble / k}%.3f,"k":$k,""" +
          f""""sf":"$sfDir"}""")
      }
    }
    spark.stop()
  }
}
