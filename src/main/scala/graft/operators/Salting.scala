package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-salting for skew (SURVEY §2 scale stance: "salting for skew, AQE
 * for runtime re-plan").
 *
 * AQE's skew-join split handles sort-merge joins at runtime; salting is
 * the static-plan tool for the two cases AQE doesn't cover:
 *  - a *stateful or exploding* aggregation where one key's group alone
 *    overwhelms a task → [[saltedAgg]] splits the group into `buckets`
 *    sub-groups, aggregates partially, then merges — correct for any
 *    commutative merge (sum/count/min/max);
 *  - a shuffle join whose hot keys flood one partition →
 *    [[saltedJoin]] spreads the left side across `buckets` salt values
 *    and replicates the (smaller) right side once per salt value.
 */
object Salting {

  /** One salted aggregate: `partial` runs per (keys..., salt) sub-group,
    * `merge` combines the sub-group results per keys (count merges as a
    * sum of partial counts; sum/min/max merge as themselves). */
  final case class SaltedAgg(name: String, partial: Column, merge: String => Column)

  /** Two-phase salted aggregation: partial aggregates per
    * (keys..., salt), merged per keys. The salt derives from
    * `saltSource` (any high-cardinality column), so the plan stays
    * deterministic; correctness requires only that each agg's merge
    * combines its partials (true for sum/count/min/max). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      buckets: Int)(aggs: SaltedAgg*): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    val partialCols = aggs.map(a => a.partial.as(a.name))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.map(a => a.merge(a.name).as(a.name))
    partial.groupBy(keys.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** Salted equi-join on `key`: left rows get a salt in [0, buckets);
    * the right side is replicated once per salt value, so every pair
    * still meets exactly once while the hot key's rows spread over
    * `buckets` partitions. Use when the right side is too big to
    * broadcast but far smaller than the skewed left. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      saltSource: Column): DataFrame = {
    require(buckets > 0)
    val saltedLeft = left.withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
