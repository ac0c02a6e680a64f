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
    val rStruct = struct((right(ts).as("__rts") +: carried.map(right(_))).toIndexedSeq: _*)
    val lStruct = struct(leftRest.toIndexedSeq.map(left(_)): _*)
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

  /** HOT-KEY-SAFE as-of join: same semantics as [[asofJoin]], but the
    * carry window partitions on `(keys, ts div bucketUs)` instead of
    * bare `keys` — a single pathological hot key (one user with 10⁹
    * events, one instrument with the whole day's ticks) no longer
    * serializes into one task; it spreads across its time buckets.
    *
    * The cross-bucket carry — "what was the latest right row BEFORE my
    * bucket started?" — is restored by a second, tiny pass: per
    * (keys, bucket) the latest right struct is a map-side-combinable
    * `max_by` aggregate, and the running carry over buckets is an
    * ordered window over THAT summary (rows = buckets per key, ~10⁴ for
    * a month of minutes — trivially sequential even for the hottest
    * key). Each bucket's rows then seed their in-bucket carry with the
    * summary's predecessor value via coalesce. Cost vs [[asofJoin]]:
    * one extra (small) shuffle of the per-bucket summary and a
    * same-partitioning join back — the price of unbounded per-key
    * parallelism. Use [[asofJoin]] when keys are well-distributed;
    * this form when any key can be pathologically hot.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, bucketUs: Long, suffix: String = ""): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(bucketUs > 0, "bucket width must be positive")
    val carried = right.columns.filterNot(c => keys.contains(c) || c == ts)
    val leftRest = left.columns.filterNot(c => keys.contains(c) || c == ts)
    require(suffix.nonEmpty || carried.forall(!leftRest.contains(_)),
      s"carried right columns collide with left (${carried.mkString(",")}); " +
        "pass a suffix")
    val rStruct = struct((right(ts).as("__rts") +: carried.map(right(_))).toIndexedSeq: _*)
    val lStruct = struct(leftRest.toIndexedSeq.map(left(_)): _*)
    val rType = org.apache.spark.sql.types.StructType(
      right.schema(ts).copy(name = "__rts") +: carried.map(right.schema(_))
    ).catalogString
    val lType = org.apache.spark.sql.types.StructType(
      leftRest.map(left.schema(_))).catalogString
    // floor-bucket (ts can be negative-epoch in principle: use exact
    // floor division, same idiom as BandJoinRewrite)
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketUs))) / bucketUs).cast("long")
    val unioned = right
      .select((keys.map(right(_)) :+ right(ts) :+ lit(0).as("__side") :+
        rStruct.as("__r") :+ lit(null).cast(lType).as("__l")): _*)
      .unionByName(
        left.select((keys.map(left(_)) :+ left(ts) :+ lit(1).as("__side") :+
          lit(null).cast(rType).as("__r") :+ lStruct.as("__l")): _*),
        allowMissingColumns = false)
      .withColumn("__bucket", bucketOf(col(ts)))
    // pass 1 (tiny): latest right struct per (keys, bucket) — map-side
    // combinable; then the running carry INTO each bucket = latest right
    // of any STRICTLY EARLIER bucket (rows between unbounded and -1).
    // Grouped over ALL rows (not just right ones) so buckets holding
    // only left rows still get a summary row — max_by skips the
    // null-ordering left rows, yielding null __rlast there, and the
    // ignoreNulls carry window reaches past them to the last real one.
    val perBucket = unioned
      .groupBy((keys.map(col) :+ col("__bucket")): _*)
      .agg(max_by(col("__r"),
        when(col("__side") === 0, col(ts))).as("__rlast"))
    val carryW = Window.partitionBy(keys.map(col): _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = perBucket
      .withColumn("__carry",
        last(col("__rlast"), ignoreNulls = true).over(carryW))
      .select((keys.map(col) :+ col("__bucket") :+ col("__carry")): _*)
    // pass 2: in-bucket ordered carry, seeded by the bucket's incoming
    // carry. Window partitions on (keys, bucket) — the hot key spreads.
    // Left join: buckets holding only left rows still need their carry;
    // buckets with no right row anywhere before them yield null → the
    // row is dropped (inner as-of), same as asofJoin.
    val w = Window.partitionBy((keys.map(col) :+ col("__bucket")): _*)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedCols = carried.map(c => col(s"__asof.$c").as(c + suffix)) :+
      col("__asof.__rts").as(ts + "_asof")
    unioned
      .join(carry, keys :+ "__bucket", "left")
      .withColumn("__asof", coalesce(
        last(when(col("__side") === 0, col("__r")), ignoreNulls = true).over(w),
        col("__carry")))
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
