package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, TextAnalysis}
import graft.sources.Records

/** Scale curve for the BPE trainer ([[graft.operators.Bpe]]): the
  * 100-TB claim is "corpus scanned ONCE (vocabulary aggregate), every
  * merge round VOCABULARY-sized" — so round cost should track |vocab|
  * (Heaps' law: ~√corpus), not the corpus. This main measures the two
  * phases separately for one sf dir and prints one JSON line:
  * `{"metric":"bpe_scale","docs":n,"vocab":v,"build_sec":…,
  *   "rounds":k,"rounds_sec":…,"sec_per_round":…}`.
  *
  * Usage: BpeScaleBench <sfDir> [nMerges]
  */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-bpe-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val raw = Records.table(spark, sfDir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val base = if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    val n = base.count()

    // phase 1 — the ONE corpus scan: vocabulary aggregate, materialized
    val t0 = System.nanoTime()
    val vocabTmp = SessionTemp.dir("bpe_scale_vocab_")
    base.select(explode(expr(TextAnalysis.tokensExpr)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .write.mode("overwrite").parquet(vocabTmp)
    val vocab = spark.read.parquet(vocabTmp)
    val v = vocab.count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    // phase 2 — n merge rounds, each vocabulary-sized
    val t1 = System.nanoTime()
    val merges = Bpe.trainMerges(vocab, nMerges).count()
    val roundsSec = (System.nanoTime() - t1) / 1e9

    println(f"""{"metric":"bpe_scale","docs":$n,"vocab":$v,""" +
      f""""build_sec":$buildSec%.2f,"rounds":$merges,""" +
      f""""rounds_sec":$roundsSec%.2f,""" +
      f""""sec_per_round":${roundsSec / math.max(merges, 1)}%.3f,""" +
      f""""sf":"$sfDir"}""")
    spark.stop()
  }
}
