package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering
import graft.sources.Records

/** Scale curve for the clustering wing ([[graft.operators.Clustering]])
  * under CORPUS-SCALED k — the catalog entries (`c1`/`c2`) pin k=8 for
  * DuckDB-oracle parity, but the 100-TB claim is `adaptiveK`: hold the
  * expected cluster size fixed so [[Clustering.semanticDrops]]'s
  * Σ size² pair stage stays LINEAR in the corpus while the per-row
  * argmin grows only k·d flops (no plan change, no new shuffle).
  * This main measures that claim: for one sf dir it runs
  * `kMeansAssign` (iters=2) and `semanticDrops` with
  * k = adaptiveK(n), printing one JSON line
  * `{"docs":n,"k":k,"assign_sec":…,"dedup_sec":…,"drops":…,
  *   "max_cluster":…}`.
  *
  * Usage: ClusterScaleBench <sfDir> [targetClusterSize]
  */
object ClusterScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val target = if (args.length > 1) args(1).toLong else 2000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-cluster-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // parallelism floor: a small fixture can be ONE parquet row group
    // (1-2 input splits would starve the scan-side argmin on 32 cores)
    val raw = Records.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val par = spark.sparkContext.defaultParallelism
    val emb =
      if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    val n = emb.count()
    val k = Clustering.adaptiveK(n, target)
    val twoLevel = args.contains("--two-level")

    val t0 = System.nanoTime()
    // mode pinned explicitly (not auto) so each curve measures ONE path
    val asg = Clustering.kMeansAssign(emb, k, iters = 2,
      twoLevel = Some(twoLevel))
    asg.write.mode("overwrite")
      .parquet(SessionTemp.dir("cluster_scale_assign"))
    val assignSec = (System.nanoTime() - t0) / 1e9

    // max + Σ size² (the dedup pair stage's actual work) in one pass
    val stats = asg.groupBy("cluster").count()
      .agg(max("count"), sum(col("count") * col("count"))).collect()(0)
    val maxCluster = stats.getLong(0)
    val pairWork = stats.getLong(1)

    val t1 = System.nanoTime()
    val drops = Clustering.semanticDrops(emb, k, iters = 2, tau = 0.35,
        twoLevel = Some(twoLevel))
      .count()
    val dedupSec = (System.nanoTime() - t1) / 1e9

    // --mat-ab: same-session A/B of the flat path's materialize knob at
    // this k (the materializeK threshold evidence)
    if (args.contains("--mat-ab")) {
      val tOff = System.nanoTime()
      Clustering.semanticDrops(emb, k, iters = 2, tau = 0.35,
        twoLevel = Some(false), materialize = Some(false)).count()
      val offSec = (System.nanoTime() - tOff) / 1e9
      val tOn = System.nanoTime()
      Clustering.semanticDrops(emb, k, iters = 2, tau = 0.35,
        twoLevel = Some(false), materialize = Some(true)).count()
      val onSec = (System.nanoTime() - tOn) / 1e9
      println(f"""{"metric":"cluster_mat_ab","docs":$n,"k":$k,""" +
        f""""dedup_no_mat_sec":$offSec%.2f,"dedup_mat_sec":$onSec%.2f,""" +
        f""""sf":"$sfDir"}""")
    }

    val mode = if (twoLevel) "two_level" else "flat"
    println(f"""{"metric":"cluster_scale","mode":"$mode","docs":$n,""" +
      f""""k":$k,"target_cluster":$target,"assign_sec":$assignSec%.2f,""" +
      f""""dedup_sec":$dedupSec%.2f,"drops":$drops,""" +
      f""""max_cluster":$maxCluster,"pair_work":$pairWork,"sf":"$sfDir"}""")
    spark.stop()
  }
}
