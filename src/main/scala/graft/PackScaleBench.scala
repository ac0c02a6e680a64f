package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, TextAnalysis}
import graft.sources.Records

/** Hot-GROUP stress for the packing wing: [[Packing.packSequences]]'
  * running-sum window is partitioned by the pack group, so ONE
  * bot/mega source serializes into ONE task — the same hazard the
  * e1b/j1b bucketed twins measure for per-user windows.
  * [[Packing.packSequencesSharded]] is the two-level escape (pack
  * coarse id-range shards, stitch the tails); this main measures both
  * forms on an adversarial 50%-hot relabel of the documents fixture
  * (every even doc_id moves to one "hot" source — half the corpus in
  * one group) and prints one JSON line with wall + worst-task seconds:
  * `{"metric":"pack_hot","docs":n,"flat_sec":…,"flat_max_task":…,
  *   "sharded_sec":…,"sharded_max_task":…,"rows_equal":…}`.
  *
  * Usage: PackScaleBench <sfDir> [shardSpan]
  */
object PackScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-pack-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = Option(t.taskInfo).map(_.duration).getOrElse(0L)
          maxTaskMs.getAndUpdate(cur => math.max(cur, d))
        }
      })

    val raw = Records.table(spark, sfDir, "documents")
    val par = spark.sparkContext.defaultParallelism
    val base0 = if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    // 50%-hot relabel: every even doc_id joins one giant source.
    // Materialized narrow (the sharded form scans its input twice —
    // the bench measures PACK mechanics, not double tokenization; at
    // 100 TB the token counts come from an earlier materialized stage)
    val narrow = base0.select(
      when(pmod(col("doc_id"), lit(2)) === 0, lit("hot"))
        .otherwise(col("source")).as("source"),
      col("doc_id").cast("long").as("doc_id"),
      size(expr(TextAnalysis.tokensExpr)).cast("long").as("n_tokens"))
    val tmp = SessionTemp.dir("pack_hot_narrow_")
    narrow.write.mode("overwrite").parquet(tmp)
    val docs = spark.read.parquet(tmp)
    val n = docs.count()
    val span = if (args.length > 1) args(1).toLong
      else math.max(1L, n / 64) // ~64 coarse ranges over near-dense ids

    def timed(df: => org.apache.spark.sql.DataFrame): (Double, Double, Long) = {
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val rows = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async: poll until the max stops moving
      var last = -1L; var stable = 0; var spins = 0
      while (stable < 2 && spins < 40) {
        val cur = maxTaskMs.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        spins += 1; Thread.sleep(50)
      }
      (wall, maxTaskMs.get() / 1e3, rows)
    }

    val (flatSec, flatMax, flatRows) =
      timed(Packing.packSequences(docs, tokenBudget = 256L))
    val (shSec, shMax, shRows) =
      timed(Packing.packSequencesSharded(docs, tokenBudget = 256L, span))

    println(f"""{"metric":"pack_hot","docs":$n,"shard_span":$span,""" +
      f""""flat_sec":$flatSec%.2f,"flat_max_task":$flatMax%.2f,""" +
      f""""sharded_sec":$shSec%.2f,"sharded_max_task":$shMax%.2f,""" +
      f""""rows_equal":${flatRows == shRows},"sf":"$sfDir"}""")
    spark.stop()
  }
}
