package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group interpolated quantiles by HISTOGRAM NARROWING — the
  * scale-correct exact algorithm (see `q_percentiles` for the full
  * derivation vs the buffering aggregate and the per-group sort):
  *
  *  1. pass 1 builds a width-`bucketWidth` value histogram per group
  *     (map-side combinable; value-range sized, not row-count sized)
  *     and cumulative counts per bucket (window over histogram rows);
  *  2. each interpolation rank (floor/ceil of (n−1)·q, 1-indexed)
  *     locates the ONE bucket whose cumulative range covers it;
  *  3. pass 2 rescans raw rows, keeps only located buckets (broadcast),
  *     sorts WITHIN each tiny bucket (parallel across buckets), and
  *     global rank = bucket-local row_number + rows-before-bucket;
  *  4. a final per-group aggregate interpolates lower + d·(higher −
  *     lower) — the same continuous definition as Spark `percentile`
  *     and DuckDB `quantile_cont`, so results are bit-identical.
  *
  * Both passes are fully parallel scans; the worst task is one bucket's
  * sort. Ties share a value, so rank→value is deterministic under any
  * tie order. Nulls are ignored (like the built-in aggregate).
  * QuantilesProps pins equality with Spark's `percentile` on random
  * data, including single-row groups and integral ranks.
  *
  * Returns one row per group: `group`, `n`, `q0..q(k-1)` (unrounded
  * doubles, in the order of `qs`).
  */
object Quantiles {

  def exactGrouped(df: DataFrame, group: String, value: String,
      qs: Seq[Double], bucketWidth: Double = 1.0): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1]: $qs")
    require(bucketWidth > 0.0, s"bucketWidth must be positive: $bucketWidth")
    val rows = df.filter(col(value).isNotNull)
    val b = floor(col(value) / bucketWidth)
    val hist = rows.groupBy(col(group), b.as("__b"))
      .agg(count(lit(1)).as("__c"))
    val wc = Window.partitionBy(group).orderBy("__b")
    val cum = hist.withColumn("__cb", sum("__c").over(wc) - col("__c"))
    val counts = cum.groupBy(group).agg(sum("__c").as("__n"))
    // every quantile's two interpolation ranks, located to their buckets
    val rankCols = qs.flatMap { q =>
      val r = (col("__n") - 1).cast("double") * q
      Seq(floor(r) + 1, ceil(r) + 1)
    }
    val located = counts
      .select(col(group), explode(array(rankCols: _*)).as("__rank"))
      .join(cum, Seq(group))
      .filter(col("__rank") > col("__cb") &&
        col("__rank") <= col("__cb") + col("__c"))
      .select(col(group), col("__b"), col("__cb"))
      .distinct()
    val wl = Window.partitionBy(col(group), col("__b")).orderBy(value)
    val ranked = rows.withColumn("__b", b)
      .join(broadcast(located), Seq(group, "__b"))
      .withColumn("__rn", row_number().over(wl) + col("__cb"))
      .join(broadcast(counts), Seq(group))
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      val r = (col("__n") - 1).cast("double") * lit(q)
      val lo = floor(r) + 1
      val hi = ceil(r) + 1
      val lower = max(when(col("__rn") === lo, col(value)))
      val higher = max(when(col("__rn") === hi, col(value)))
      (lower + max(r - floor(r)) * (higher - lower)).as(s"q$i")
    }
    ranked.groupBy(col(group))
      .agg(max(col("__n")).as("n"), aggs: _*)
  }
}
