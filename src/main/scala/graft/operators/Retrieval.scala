package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BM25 retrieval as an engine capability: a scan form for one-shot
 * query sets and a bucket-partitioned postings index for amortized
 * probing — the retrieval primitive behind query-driven
 * decontamination and targeted quality mining in a training-data
 * pipeline. Catalog entries `x15_bm25_topk` / `x15b_bm25_indexed`
 * are thin calls into this object (the TemporalJoins precedent:
 * library surface first, bench entry second).
 *
 * Scoring is Okapi BM25 (k1 = 1.2, b = 0.75, Lucene's
 * always-positive idf = ln((N − df + ½)/(df + ½) + 1)). Determinism
 * is engineered once for both forms in [[scoreTopK]]: every input is
 * an exact BIGINT, each double op is IEEE-determined left-to-right,
 * and each term's contribution is floored to integer micro-units so
 * the per-(query, doc) sum is EXACT integer math — summation order
 * can never reorder two documents — with ties broken by doc_id.
 *
 * Scale shapes:
 *  - [[bm25TopK]] (scan form): ONE corpus pass reduces each doc
 *    in-row to (doc_id, dl, per-term tf vector) — the corpus never
 *    reaches an exchange; optimal when a query set runs once.
 *  - [[buildPostingsIndex]] / [[probeIndex]]: build pays the one
 *    corpus-wide shuffle (the x11 inverted-index shape) into
 *    bucket-partitioned postings with dl DENORMALIZED per posting
 *    (Lucene's norms trade: +8 bytes/row buys scoring without a
 *    corpus-sized doc-length join at probe). A probe's physical work
 *    is a partition-pruned scan of ≤ |terms| buckets → tiny local df
 *    agg → broadcast joins → WindowGroupLimit top-k; the corpus is
 *    never touched. Bucket count scales with the corpus
 *    ([[adaptiveBuckets]], the VectorLsh.adaptiveBits precedent) so
 *    bucket files stay near a fixed size as the corpus grows — the
 *    index write stays wide and the probe stays |terms|-pruned.
 */
object Retrieval {

  /** Whitespace tokens, empties removed (codegen'd higher-order fn) —
    * the engine-wide default tokenizer (matches PipelineQueries). */
  val defaultTokensExpr = "filter(split(text, ' '), t -> t != '')"

  /** Corpus-scaled bucket count: ceil(nDocs / targetDocsPerBucket),
    * floored at 16 so tiny corpora still exercise pruning. The default
    * target keeps a bucket's postings file near a fixed size as the
    * corpus grows (probe cost per term stays flat; the write stays one
    * file per bucket with no small-files storm). Production tunes the
    * target to blockBytes / avgPostingBytes / distinctTermsPerDoc;
    * fixtures use the default so 10×/100×/300× visibly grow nBuckets. */
  def adaptiveBuckets(nDocs: Long, targetDocsPerBucket: Long = 2000L): Long =
    math.max(16L, (nDocs + targetDocsPerBucket - 1) / targetDocsPerBucket)

  /** Cheap, scan-free fingerprint of a corpus on disk: every file's
    * (relative name, size, mtime) under `path`, canonically ordered and
    * hashed. Distinguishes a regenerated/switched fixture (the per-round
    * workflow rewrites scale fixtures in place) without reading a row —
    * so index-reuse validation costs one directory walk, not a corpus
    * scan. */
  def pathFingerprint(path: String): String = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return "absent"
    val s = java.nio.file.Files.walk(root)
    val lines =
      try s.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map { f =>
          val rel = root.relativize(f).toString
          val sz = java.nio.file.Files.size(f)
          val mt = java.nio.file.Files.getLastModifiedTime(f).toMillis
          s"$rel:$sz:$mt"
        }.toSeq.sorted
      finally s.close()
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(lines.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** (doc_id, dl, token, tf) for tokens in `termList` — from a single
    * corpus scan with the tf per term computed BY EXPRESSION
    * (size(filter(ts, t = q))), never by exploding tokens into a
    * shuffle. The 2+|terms|-narrow-column reduction lands in
    * session-temp parquet (x14's materialization pattern) so corpus
    * stats, document frequencies and scoring all derive from the tiny
    * table without rescanning (or re-tokenizing) the corpus. Returns
    * (tf table, stats table (n, sumdl)). */
  private def scanTf(corpus: DataFrame, termList: Seq[String],
      tokensExpr: String): (DataFrame, DataFrame) = {
    val s = corpus.sparkSession
    val termArr = SqlLit.quoteArray(termList)
    val base = corpus
      .select(col("doc_id"), expr(tokensExpr).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
        expr(s"transform($termArr, q -> size(filter(ts, t -> t = q)))")
          .as("tfs"))
    val tmp = graft.SessionTemp.dir("graft_bm25_tf_")
    base.write.mode("overwrite").parquet(tmp)
    val bd = s.read.parquet(tmp)
    val stats = bd.agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))
    val tf = bd
      .select(col("doc_id"), col("dl"),
        posexplode(col("tfs")).as(Seq("i", "tfi")))
      .filter(col("tfi") > 0)
      .select(col("doc_id"), col("dl"),
        element_at(typedLit(termList), col("i") + 1).as("token"),
        col("tfi").cast("long").as("tf"))
    (tf, stats)
  }

  /** The shared scoring + ranking tail of BOTH forms: given the
    * (doc_id, dl, token, tf) match table and (n, sumdl) stats, join the
    * query set (broadcast — query sets are human-sized), score in
    * floored micro-units, and keep each query's k best docs via a
    * rank-over-window the optimizer executes as WindowGroupLimit
    * (per-partition partial top-k, no global sort). One arithmetic,
    * two physical access paths — the probe ≡ scan property in
    * Bm25Props holds because this tail is literally the same code. */
  private def scoreTopK(tf: DataFrame, stats: DataFrame,
      queries: Seq[(Long, String)], k: Int): DataFrame = {
    val s = tf.sparkSession
    import s.implicits._
    val terms = queries.toDF("query_id", "token")
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "token")
      .join(broadcast(terms), "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(((col("n") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("c",
        floor(col("idf") * (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl").cast("double") * col("n").cast("double") /
              col("sumdl").cast("double"))) * lit(1000000.0)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum("c").as("score_micro"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score_micro").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("doc_id").cast("long").as("doc_id"), col("score_micro"))
      .orderBy("query_id", "rank")
  }

  /** BM25 top-k, scan form: score `queries` (a (query_id, term) set)
    * against `corpus` (doc_id, text) in one corpus pass and keep each
    * query's k best documents. Output: (query_id, rank, doc_id,
    * score_micro), rank 1..k. */
  def bm25TopK(corpus: DataFrame, queries: Seq[(Long, String)], k: Int,
      tokensExpr: String = defaultTokensExpr): DataFrame = {
    val termList = queries.map(_._2).distinct
    val (tf, stats) = scanTf(corpus, termList, tokensExpr)
    scoreTopK(tf, stats, queries, k)
  }

  /** Index-commit marker: JSON under `<dir>/_built` recording the
    * corpus fingerprint + build geometry. Its EXISTENCE commits a
    * finished build (half-written indexes rebuild); its CONTENT guards
    * reuse — a marker whose fingerprint no longer matches the corpus is
    * a stale index and [[ensureIndex]] rebuilds instead of silently
    * serving top-k from the old corpus. */
  /** Postings schema, pinned so reads never depend on inference — a
    * corpus of all-empty documents writes ZERO postings rows (just the
    * directory), and schema inference over an empty parquet dir throws
    * where an explicit schema reads an empty relation. */
  private val postingsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dl",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("token",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tf",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("bucket",
      org.apache.spark.sql.types.LongType)))

  private case class IndexMeta(fingerprint: String, nBuckets: Long, n: Long)
  private def markerPath(dir: String) = java.nio.file.Paths.get(dir, "_built")
  private def readMeta(dir: String): Option[IndexMeta] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readAllBytes(markerPath(dir)))
      Some(IndexMeta(node.get("fingerprint").asText(),
        node.get("nBuckets").asLong(), node.get("n").asLong()))
    } catch { case _: Exception => None }

  /** Build the bucket-partitioned postings index for `corpus` under
    * `indexDir`: postings (token, doc_id, tf, dl) written
    * `partitionBy(bucket = xxhash64(token) % nBuckets)` after a
    * repartition on the bucket (one file per bucket), corpus stats
    * (n, sumdl) pre-aggregated into a 1-row table, then the
    * fingerprinted `_built` marker. `nBuckets` defaults to
    * [[adaptiveBuckets]](corpus count) — corpus-scaled so bucket files
    * stay near fixed size. Returns the bucket count used. */
  def buildPostingsIndex(corpus: DataFrame, indexDir: String,
      fingerprint: String, nBuckets: Option[Long] = None,
      tokensExpr: String = defaultTokensExpr): Long = {
    val s = corpus.sparkSession
    val base = corpus
      .select(col("doc_id"), expr(tokensExpr).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
        col("ts"))
    // count() on the parquet-backed corpus is metadata-cheap; on a
    // derived frame it is one narrow pass — either way build-time only
    val nDocs = corpus.count()
    val nb = nBuckets.getOrElse(adaptiveBuckets(nDocs))
    require(nb > 0, s"nBuckets must be positive (got $nb)")
    base.select(col("doc_id"), col("dl"), explode(col("ts")).as("token"))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("token")), lit(nb)))
      .repartition(nb.toInt, col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexDir/postings")
    // stats WITHOUT a second corpus pass (tokenization is the build's
    // dominant per-row cost — paying it twice doubles a 100 TB build):
    // n is the already-computed count; Σdl folds over the written
    // postings (dl is constant per doc; a token-less doc is absent from
    // postings and contributes exactly its dl = 0)
    s.read.schema(postingsSchema).parquet(s"$indexDir/postings")
      .groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(lit(nDocs).cast("long").as("n"), sum("dl").as("sumdl"))
      .na.fill(0L, Seq("sumdl")) // all-empty corpus: SUM over no rows
      .write.mode("overwrite").parquet(s"$indexDir/stats")
    val meta =
      s"""{"fingerprint":"$fingerprint","nBuckets":$nb,"n":$nDocs}"""
    java.nio.file.Files.write(markerPath(indexDir),
      meta.getBytes("UTF-8")): Unit
    nb
  }

  /** Build the index only when absent OR stale (marker missing, or its
    * recorded fingerprint differs from `fingerprint`). The reuse path
    * costs one marker read — no corpus access. Returns the bucket
    * count in effect. */
  def ensureIndex(corpus: => DataFrame, indexDir: String,
      fingerprint: String, nBuckets: Option[Long] = None,
      tokensExpr: String = defaultTokensExpr): Long =
    readMeta(indexDir) match {
      case Some(m) if m.fingerprint == fingerprint &&
          nBuckets.forall(_ == m.nBuckets) => m.nBuckets
      case _ =>
        buildPostingsIndex(corpus, indexDir, fingerprint, nBuckets,
          tokensExpr)
    }

  /** Bucket ids of the given tokens under the SAME xxhash64 the index
    * write used — computed through a Spark expression (not a JVM
    * reimplementation) so probe-side pruning can never drift from the
    * engine's hash. One metadata-sized local eval. */
  def bucketIdsOf(s: SparkSession, tokens: Seq[String],
      nBuckets: Long): Seq[Long] = {
    import s.implicits._
    tokens.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(nBuckets)).as("b"))
      .collect().map(_.getLong(0)).toSeq.distinct
  }

  /** BM25 top-k, probe form: score `queries` against a pre-built index
    * (steady state — the corpus is never touched). Physical work:
    * partition-pruned scan of ≤ |terms| buckets → local df agg →
    * broadcast joins → WindowGroupLimit top-k. The bucket count comes
    * from the index's own marker, so a probe needs no out-of-band
    * geometry knowledge. Same output contract as [[bm25TopK]]. */
  def probeIndex(s: SparkSession, indexDir: String,
      queries: Seq[(Long, String)], k: Int): DataFrame = {
    val meta = readMeta(indexDir).getOrElse(throw new IllegalStateException(
      s"no committed index at $indexDir (run buildPostingsIndex first)"))
    val termList = queries.map(_._2).distinct
    val stats = s.read.parquet(s"$indexDir/stats")
    val tf = s.read.schema(postingsSchema).parquet(s"$indexDir/postings")
      .filter(col("bucket").isin(bucketIdsOf(s, termList, meta.nBuckets): _*) &&
        col("token").isInCollection(termList))
      .select(col("doc_id"), col("dl"), col("token"),
        col("tf").cast("long").as("tf"))
    scoreTopK(tf, stats, queries, k)
  }
}
