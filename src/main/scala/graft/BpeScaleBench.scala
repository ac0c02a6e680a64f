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
  * With `batchSize > 1` the trainer is [[Bpe.trainMergesBatched]] —
  * the bounded-job-count path for real tokenizer merge budgets — and
  * the line carries `batch_size`; the merge tables are
  * order-equivalent (BpeSpec), so sequential-vs-batched `rounds_sec`
  * at the same nMerges is a pure job-overhead comparison. The line
  * also reports the corpus-tokenization APPLY phase (x9d) both ways:
  * `tokenize_sec` (direct in-row rewrite) and `tokenize_vocab_sec`
  * (via-vocab join form).
  *
  * A 4th argument `skipDirect` omits the per-occurrence
  * `tokenizeCorpus` phase: at production merge budgets the direct
  * chunked rewrite pays a corpus materialization per chunk
  * (O(merges/chunk) corpus writes — measured 45.5 s at 500k docs /
  * 401 merges and past 10 min at 5M docs), which is exactly why
  * `tokenCountsViaVocab` is the production path; the flag lets the
  * big-corpus point record train + via-vocab without the known-bad
  * phase.
  *
  * `<sfDir>` may instead be `zipf:<docs>:<vmax>` — a synthesized
  * Heaps-law-richer corpus (the fixture documents' ~982-type vocab
  * exhausts real merge budgets early, recorded in notes_r19): each doc
  * is 40 tokens drawn log-uniformly over ranks 1..vmax (≈ Zipf
  * p(r) ∝ 1/r) with the token string the rank's base-36 encoding —
  * tens of thousands of types sharing character structure, so
  * 4k–8k-merge budgets have real material. Deterministic (xxhash64 of
  * (doc, position) — no driver RNG, no collect).
  *
  * Usage: BpeScaleBench <sfDir>|zipf:<docs>:<vmax> [nMerges] [batchSize] [skipDirect]
  */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 16
    val batchSize = if (args.length > 2) args(2).toInt else 1
    val skipDirect = args.length > 3 && args(3) == "skipDirect"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-bpe-scale", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val raw =
      if (sfDir.startsWith("zipf:")) {
        val parts = sfDir.split(":")
        val (nDocs, vmax) = (parts(1).toLong, parts(2).toLong)
        spark.range(nDocs).select(col("id").as("doc_id"),
          expr(s"""concat_ws(' ', transform(sequence(1, 40), j ->
            |conv(cast(pow($vmax,
            |  (pmod(xxhash64(concat(cast(id as string), '_',
            |    cast(j as string))), 1000000) + 0.5) / 1000000.0)
            |  as bigint), 10, 36)))""".stripMargin).as("text"))
      } else Records.table(spark, sfDir, "documents")
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
    val driverRounds = new java.util.concurrent.atomic.AtomicLong(0)
    val mergeRows = (if (batchSize > 1)
        Bpe.trainMergesBatched(vocab, nMerges, batchSize,
          roundsOut = Some(driverRounds))
      else Bpe.trainMerges(vocab, nMerges)).collect()
    val merges = mergeRows.length.toLong
    val roundsSec = (System.nanoTime() - t1) / 1e9
    // sequential trainer = one driver round-trip per merge by definition
    val rounds = if (batchSize > 1) driverRounds.get() else merges

    // phase 3 — corpus tokenization with the trained merges (x9d),
    // both forms (direct rewrite / via-vocab join)
    val ms = mergeRows.sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val t2 = System.nanoTime()
    if (!skipDirect)
      Bpe.tokenizeCorpus(base, ms)
        .agg(sum("n_bpe_tokens")).collect()
    val tokSec = if (skipDirect) -1.0 else (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    Bpe.tokenCountsViaVocab(base, ms)
      .agg(sum("n_bpe_tokens")).collect()
    val tokVocabSec = (System.nanoTime() - t3) / 1e9
    // the re-deriving legacy shape (tokenize runs once per consumer) —
    // the A/B for the materialized token stream
    val t4 = System.nanoTime()
    Bpe.tokenCountsViaVocab(base, ms, materializeTokens = false)
      .agg(sum("n_bpe_tokens")).collect()
    val tokVocabNomatSec = (System.nanoTime() - t4) / 1e9

    println(f"""{"metric":"bpe_scale","docs":$n,"vocab":$v,""" +
      f""""build_sec":$buildSec%.2f,"rounds":$merges,""" +
      f""""batch_size":$batchSize,""" +
      f""""driver_rounds":$rounds,""" +
      f""""accept_ratio":${merges.toDouble / math.max(rounds, 1)}%.2f,""" +
      f""""rounds_sec":$roundsSec%.2f,""" +
      f""""sec_per_merge":${roundsSec / math.max(merges, 1)}%.3f,""" +
      f""""tokenize_sec":$tokSec%.2f,"tokenize_vocab_sec":$tokVocabSec%.2f,""" +
      f""""tokenize_vocab_nomat_sec":$tokVocabNomatSec%.2f,""" +
      f""""sf":"$sfDir"}""")
    spark.stop()
  }
}
