package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * The size-gated broadcast hint shared by every operator whose join
 * side is "usually small, but NOT bounded by construction" — the
 * bigram model ([[LanguageModel.bigramPerplexity]]: Heaps-law observed
 * bigrams reach billions of rows on a real corpus) and the BPE
 * symbol-count vocabulary ([[Bpe.tokenCountsViaVocab]]: Heaps-law
 * types). Broadcasting such a side unconditionally hits Spark's 8 GB
 * broadcast ceiling and driver memory at 100 TB; never broadcasting
 * wastes the common small case. The gate counts the MATERIALIZED
 * relation (callers pass a parquet-backed frame, so `count()` is
 * answered from footer metadata) and applies the hint only at or
 * below the row ceiling — above it the join runs as a plain shuffle
 * join on its (perfectly partitionable) key.
 */
object Broadcasts {

  /** Default row ceiling: a gated row is a few short strings + a
    * numeric — ~100 B in the broadcast hash relation — so 2M rows is a
    * few hundred MB: comfortably under the 8 GB hard cap and typical
    * executor headroom. */
  val defaultMaxRows: Long = 2000000L

  /** Hint `df` for broadcast iff it has at most `maxRows` rows.
    * `df` should be materialized (parquet-backed) — on a derived frame
    * the count is one extra job of the frame's own cost. */
  def sizeGated(df: DataFrame, maxRows: Long = defaultMaxRows): DataFrame =
    if (df.count() <= maxRows) broadcast(df) else df
}
