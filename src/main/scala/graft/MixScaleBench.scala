package graft

import org.apache.spark.sql.functions._

import graft.operators.Selection
import graft.sources.Records

/** The p16/p16b domain-mix wing, measured at scale: metric build (one
  * corpus scan to the 4-column (doc, source, n_tok, quality) relation,
  * materialized — the x16 pattern), per-domain budget selection
  * (selectByDomainBudget — rank-value aggregation keyed by domain),
  * and the capped-repetition mix (domainMixWithRepetition). The claim
  * under test: selection cost is driven by the narrow metric relation
  * and its aggregate-bounded (domain, rank) table, so select/mix
  * seconds should grow ~linearly with docs while the window state
  * stays rank-domain-sized. One JSON line per phase:
  * `{"metric":"mix_scale","phase":…,"docs":n,"sec":…,"rows":…}`.
  *
  * Usage: MixScaleBench <sfDir>   (the p16/p16b fixture weights).
  */
object MixScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-mix-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val raw = Records.table(spark, sfDir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val docs = if (raw.rdd.getNumPartitions < par) raw.repartition(par)
      else raw
    val n = docs.count()

    val tmp = graft.SessionTemp.dir("graft_mix_scale_")
    val t0 = System.nanoTime()
    Selection.vocabRichnessMicro(docs, carryCols = Seq("source"))
      .write.mode("overwrite").parquet(tmp)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val m = spark.read.parquet(tmp)
    println(f"""{"metric":"mix_scale","phase":"metric_build",""" +
      f""""docs":$n,"sec":$buildSec%.2f,"sf":"$sfDir"}""")

    // the p16b weight vector: cap path (src0), repetition+remainder
    // (src1/src2), partial-only (the rest)
    val weights = (0 until 20)
      .map(i => (s"src$i",
        if (i == 0) 500000L else if (i < 3) 150000L else 25000L))
      .toDF("source", "w_micro")
    val budgets = Selection.domainBudgets(m, weights)

    val t1 = System.nanoTime()
    val selRows = Selection.selectByDomainBudget(m, budgets)
      .agg(count(lit(1)), sum("n_tok")).head()
    val selSec = (System.nanoTime() - t1) / 1e9
    println(f"""{"metric":"mix_scale","phase":"select",""" +
      f""""docs":$n,"sec":$selSec%.2f,"rows":${selRows.getLong(0)},""" +
      f""""kept_tokens":${selRows.getLong(1)},"sf":"$sfDir"}""")

    val t2 = System.nanoTime()
    val mixRows = Selection.domainMixWithRepetition(m, budgets,
        maxEpochs = 4)
      .agg(count(lit(1)), sum("n_tok"), max("epoch")).head()
    val mixSec = (System.nanoTime() - t2) / 1e9
    println(f"""{"metric":"mix_scale","phase":"mix_epochs",""" +
      f""""docs":$n,"sec":$mixSec%.2f,"rows":${mixRows.getLong(0)},""" +
      f""""kept_tokens":${mixRows.getLong(1)},""" +
      f""""max_epoch":${mixRows.getLong(2)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
