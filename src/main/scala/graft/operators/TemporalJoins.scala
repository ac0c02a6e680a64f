package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Reusable temporal join operators over arbitrary DataFrames — the
 * library surface behind the gated queries j1 (as-of) and j2/j3 (band).
 *
 * Scale stance: [[asofJoin]] is the distributed-merge form — union both
 * sides, ONE hash shuffle on the key columns, and a per-key ordered
 * window carrying the latest right-side struct forward; per-key state is
 * one struct, never a buffered interval. Band joins need no library
 * call: write the naive `abs(l - r) <= C` / BETWEEN predicate and
 * [[graft.plans.BandJoinRewrite]] plans the bucketed equi-join
 * automatically ([[bandCondition]] builds that predicate for callers who
 * want the bounds spelled once).
 */
object TemporalJoins {

  /** Backward (at-or-before, inclusive) as-of join: each left row picks
    * up the non-key/non-ts columns of the LATEST right row with
    * `right.ts <= left.ts` on the same `keys`; left rows with no prior
    * right row are dropped (inner as-of). Right rows must be unique per
    * (keys, ts) — pre-aggregate otherwise (ambiguous carries would be
    * nondeterministic). Carried columns keep their names; pass `suffix`
    * to disambiguate collisions with left column names. The matched
    * right row's timestamp is always carried as `<ts>_asof`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, suffix: String = ""): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val carried = right.columns.filterNot(c => keys.contains(c) || c == ts)
    val leftRest = left.columns.filterNot(c => keys.contains(c) || c == ts)
    require(suffix.nonEmpty || carried.forall(!leftRest.contains(_)),
      s"carried right columns collide with left (${carried.mkString(",")}); " +
        "pass a suffix")
    val rStruct = struct((right(ts).as("__rts") +: carried.map(right(_))): _*)
    val lStruct = struct(leftRest.map(left(_)): _*)
    val rType = org.apache.spark.sql.types.StructType(
      right.schema(ts).copy(name = "__rts") +: carried.map(right.schema(_))
    ).catalogString
    val lType = org.apache.spark.sql.types.StructType(
      leftRest.map(left.schema(_))).catalogString
    val unioned = right
      .select((keys.map(right(_)) :+ right(ts) :+ lit(0).as("__side") :+
        rStruct.as("__r") :+ lit(null).cast(lType).as("__l")): _*)
      .unionByName(
        left.select((keys.map(left(_)) :+ left(ts) :+ lit(1).as("__side") :+
          lit(null).cast(rType).as("__r") :+ lStruct.as("__l")): _*),
        allowMissingColumns = false)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedCols = carried.map(c => col(s"__asof.$c").as(c + suffix)) :+
      col("__asof.__rts").as(ts + "_asof")
    unioned
      .withColumn("__asof",
        last(when(col("__side") === 0, col("__r")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__asof").isNotNull)
      .select(keys.map(col) ++ Seq(col(ts)) ++
        leftRest.map(c => col(s"__l.$c").as(c)) ++ carriedCols: _*)
  }

  /** The naive band predicate `lo <= rightTs − leftTs <= hi` — written
    * plainly so [[graft.plans.BandJoinRewrite]] rewrites the join into
    * the bucketed equi-join. Bounds are inclusive; operands integral. */
  def bandCondition(leftTs: Column, rightTs: Column, lo: Long, hi: Long): Column =
    rightTs >= leftTs + lo && rightTs <= leftTs + hi
}
