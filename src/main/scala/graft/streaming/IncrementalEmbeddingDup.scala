package graft.streaming

import graft.functions.VectorLsh
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming INCREMENTAL EMBEDDING near-dedup — the cosine-space member
  * of the durable-dedup triple ([[IncrementalDedup]] exact hashes,
  * [[IncrementalNearDup]] lexical MinHash-LSH, this module semantic
  * embeddings): vectors arrive continuously and each is checked against
  * a PERSISTENT hyperplane-bucket index of everything seen before —
  * SemDeDup-style semantic dedup as a daily incremental job instead of
  * a full-corpus recluster.
  *
  * A vector is a near-dup iff ANY earlier vector shares a
  * (label, table, bucket) cell for one of the hash tables — the same
  * random-hyperplane buckets d5 blocks with ([[VectorLsh]]: vectors on
  * the same side of every plane in a table collide; P(collide/table) =
  * (1 − θ/π)^bits). See [[MinRuleIncremental]] for the min-rule
  * semantics and the layout. Bits are FIXED per index lifetime (the
  * index layout cannot depend on a future corpus size — production
  * picks them from the capacity plan; d5's batch form sizes
  * adaptively), matching the oracle's constants at the fixture scales.
  */
object IncrementalEmbeddingDup {

  val Tables = 2
  val BitsPerTable = 3
  val Dims = 64

  private def buckets(batch: DataFrame): DataFrame = {
    val tb = (0 until Tables).map(t =>
      struct(lit(t).as("tbl"),
        expr(VectorLsh.bucketExpr("v", t, BitsPerTable, Dims)).as("bucket")))
    batch
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("tb", explode(array(tb: _*)))
      .select(col("vec_id"), col("label"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  def run(s: SparkSession, embDir: String, workDir: String,
      failAtBatch: Option[Long] = None,
      compactEvery: Int = 16): Unit =
    MinRuleIncremental.run(s, embDir, workDir,
      globFilter = "embeddings*.parquet", idCol = "vec_id",
      bucketCols = Seq("label", "tbl", "bucket"), bucketize = buckets,
      failAtBatch = failAtBatch, compactEvery = compactEvery)

  /** (vec_id, kept, dup_of) across every processed batch. */
  def results(s: SparkSession, workDir: String): DataFrame =
    MinRuleIncremental.results(s, workDir, "vec_id")
}
