package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel
import graft.sources.Records

/** The x14 second-scan materialization, measured: scoring from the
  * materialized (id, prev, cur) bigram stream vs the legacy shape that
  * re-tokenizes and re-explodes the corpus at score time (the
  * round-17 advice item). Same-session A/B — one JSON line per mode:
  * `{"metric":"lm_scale","docs":n,"mode":…,"sec":…,"scored_docs":…}`.
  *
  * Usage: LmScaleBench <sfDir> [modes…]  (default: materialized legacy).
  */
object LmScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val modes = if (args.length > 1) args.drop(1).toSeq
      else Seq("materialized", "legacy")
    // an unrecognized mode would silently run the legacy shape under
    // the requested label, making an A/B compare legacy with itself
    require(modes.forall(Set("materialized", "legacy")),
      s"unknown mode in $modes — use materialized|legacy")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-lm-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val raw = Records.table(spark, sfDir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs = if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    val n = docs.count()

    modes.foreach { mode =>
      val t0 = System.nanoTime()
      val scored = LanguageModel.bigramPerplexity(docs,
          materializeBigrams = mode == "materialized")
        .agg(count(lit(1)), sum("n_bigrams")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"lm_scale","docs":$n,"mode":"$mode",""" +
        f""""sec":$sec%.2f,"scored_docs":${scored.getLong(0)},""" +
        f""""n_bigrams":${scored.getLong(1)},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
