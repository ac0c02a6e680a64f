package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.functions.broadcast

/**
 * The size-gated broadcast hint shared by every operator whose join
 * side is "usually small, but NOT bounded by construction" — the
 * bigram model ([[LanguageModel.bigramPerplexity]]: Heaps-law observed
 * bigrams reach billions of rows on a real corpus), the BPE
 * symbol-count vocabulary ([[Bpe.tokenCountsViaVocab]]: Heaps-law
 * types) and the span-dedup keeper table ([[Dedup.spanDedupCorpus]]:
 * census-sized). Broadcasting such a side unconditionally hits Spark's
 * 8 GB broadcast ceiling and driver memory at 100 TB; never
 * broadcasting wastes the common small case. The gate counts the
 * MATERIALIZED relation and applies the hint only at or below the row
 * ceiling — above it the join runs as a plain shuffle join on its
 * (perfectly partitionable) key.
 *
 * The counting contract is STRUCTURAL, not a Scaladoc note: without a
 * caller-supplied row count the gate requires the input plan to be a
 * bare scan (column-pruning projections and aliases over a leaf
 * relation), where `count()` is answered from file-footer metadata. A
 * derived frame — a join, aggregate, filter, generate — would silently
 * pay its full computation twice (once for the gate, once for the
 * query), so it fails loudly instead: derive the count from something
 * already known (e.g. an upper bound counted earlier) and pass it as
 * `knownRows`, or materialize the frame to session-temp parquet first.
 */
object Broadcasts {

  /** Default row ceiling: a gated row is a few short strings + a
    * numeric — ~100 B in the broadcast hash relation — so 2M rows is a
    * few hundred MB: comfortably under the 8 GB hard cap and typical
    * executor headroom. */
  val defaultMaxRows: Long = 2000000L

  /** Is `plan` metadata-countable — projections/aliases over one leaf
    * relation (a parquet scan counts from footers)? Anything that
    * computes rows (Filter, Join, Aggregate, Generate, …) is not. */
  private[operators] def isBareScan(plan: LogicalPlan): Boolean = plan match {
    case p: Project => isBareScan(p.child)
    case a: SubqueryAlias => isBareScan(a.child)
    case _: LeafNode => true
    case _ => false
  }

  /** Hint `df` for broadcast iff it has at most `maxRows` rows.
    *
    * `knownRows >= 0` supplies the row count (or any UPPER BOUND — the
    * gate only needs "definitely fits") and skips the counting job
    * entirely. With the default `knownRows = -1` the gate counts the
    * frame itself and REQUIRES it to be a bare scan (see object
    * Scaladoc) so the count is metadata-cheap — a derived frame is
    * rejected at call time rather than silently doubling its cost. */
  def sizeGated(df: DataFrame, maxRows: Long = defaultMaxRows,
      knownRows: Long = -1L): DataFrame = {
    val n =
      if (knownRows >= 0L) knownRows
      else {
        require(isBareScan(df.queryExecution.analyzed),
          "sizeGated without knownRows requires a bare scan (the count " +
            "must be metadata-cheap): materialize the frame to " +
            "session-temp parquet first, or pass knownRows (any upper " +
            s"bound). Got plan:\n${df.queryExecution.analyzed.treeString}")
        df.count()
      }
    if (n <= maxRows) broadcast(df) else df
  }
}
