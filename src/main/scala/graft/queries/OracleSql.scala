package graft.queries

/**
 * Shared DuckDB oracle-SQL builders for catalog entries whose oracles
 * replay a multi-round chain — pulled out of [[PipelineQueries]] so
 * entry definitions stay one screen (the scaffolding here is oracle
 * TEXT generation only; no Spark planning lives in this file).
 *
 * Both builders replay the BPE merge chain the x9b trainer gates:
 * replace() is non-overlapping left-to-right in both engines, which IS
 * greedy BPE pairing, and the chr(31) unit separators / chr(30) record
 * separator match [[graft.operators.Bpe]]'s encoding exactly.
 */
private[queries] object OracleSql {

  /** The x9b training chain: vocab → s0 (separator-encoded char
    * segmentation) → n rounds of (pair counts p_r, best pair b_r,
    * segmentation s_r). Ends without a trailing comma — callers append
    * their final SELECT (or more CTEs). */
  def bpeChainSql(n: Int): String = {
    val sep = "chr(31)"
    def u(x: String) = s"$sep || $x || $sep"
    val sb = new StringBuilder
    sb.append(
      s"""WITH vocab AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> ''))
         |          AS token FROM documents)
         |  GROUP BY token),
         |s0 AS (
         |  SELECT tf, substr(x, 1, length(x) - 1) AS seg FROM (
         |    SELECT tf, $sep || regexp_replace(token, '(?s)(.)', '\\1' || $sep || $sep, 'g') AS x
         |    FROM vocab WHERE token NOT LIKE '%' || $sep || '%')),
         |""".stripMargin)
    for (r <- 1 to n) {
      sb.append(
        s"""p$r AS (
           |  SELECT p[1] AS l, p[2] AS r, CAST(SUM(tf) AS BIGINT) AS cnt FROM (
           |    SELECT tf, unnest(list_zip(sm, sm[2:])) AS p FROM (
           |      SELECT tf, string_split(substr(seg, 2, length(seg) - 2), $sep || $sep) AS sm
           |      FROM s${r - 1}))
           |  WHERE p[2] IS NOT NULL GROUP BY 1, 2),
           |b$r AS (SELECT l, r, cnt FROM p$r ORDER BY cnt DESC, l, r LIMIT 1),
           |s$r AS (
           |  SELECT tf, replace(seg, ${u("l")} || ${u("r")}, ${u("l || r")}) AS seg
           |  FROM s${r - 1}, b$r),
           |""".stripMargin)
    }
    // drop the trailing ",\n" of the last CTE
    sb.setLength(sb.length - 2)
    sb.toString
  }

  /** The d17-family oracle: replay the span census, the keep-first
    * rule and the token-coverage cut relationally. `sampleMod > 1`
    * folds the deterministic digest gate in (the d17c form — census
    * and firsts over sampled spans only); `spanTokens` is the window
    * width. Shared verbatim by d17 (literal mode), d17b (bloom mode —
    * output equality across physical modes is the contract) and d17c
    * (sampled). */
  def spanDedupSql(spanTokens: Int, sampleMod: Long = 1L): String = {
    val n = spanTokens
    val occ = if (sampleMod > 1L) "samp" else "sp"
    val sampCte = if (sampleMod > 1L)
      s"""samp AS (
         |  SELECT * FROM sp
         |  WHERE ('0x' || substr(span_h, 1, 15))::BIGINT % $sampleMod = 0),
         |""".stripMargin
    else ""
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id, i - 1 AS pos, md5(array_to_string(ts[i:i+${n - 1}], ' ')) AS span_h
       |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - $n + 2)) AS i
       |        FROM t WHERE len(ts) >= $n)),
       |${sampCte}cen AS (
       |  SELECT span_h FROM $occ GROUP BY span_h HAVING COUNT(*) >= 2),
       |firsts AS (
       |  SELECT span_h, doc_id AS f_doc, pos AS f_pos FROM (
       |    SELECT $occ.span_h, $occ.doc_id, $occ.pos,
       |      ROW_NUMBER() OVER (PARTITION BY $occ.span_h
       |                         ORDER BY $occ.doc_id, $occ.pos) AS rn
       |    FROM $occ JOIN cen USING (span_h)) WHERE rn = 1),
       |cut AS (
       |  SELECT $occ.doc_id, $occ.pos
       |  FROM $occ JOIN cen USING (span_h)
       |  LEFT JOIN firsts f ON f.span_h = $occ.span_h AND f.f_doc = $occ.doc_id
       |    AND f.f_pos = $occ.pos
       |  WHERE f.span_h IS NULL),
       |cov AS (
       |  SELECT DISTINCT doc_id, pos + d AS j
       |  FROM cut, (SELECT unnest(range(0, $n)) AS d) ds),
       |covl AS (SELECT doc_id, list(j) AS js FROM cov GROUP BY doc_id),
       |outp AS (
       |  SELECT t.doc_id, len(t.ts) AS n_tokens,
       |    list_filter(t.ts,
       |      (x, i) -> c.js IS NULL OR NOT list_contains(c.js, i - 1)) AS kept
       |  FROM t LEFT JOIN covl c USING (doc_id))
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  COALESCE(array_to_string(kept, ' '), '') AS kept_text
       |FROM outp ORDER BY doc_id""".stripMargin
  }

  /** [[bpeChainSql]] extended with the CORPUS-side segmentation chain:
    * ds0 encodes every document (each whitespace token's char
    * segmentation, tokens joined by chr(30) so merges cannot cross
    * token boundaries), ds1..dsN apply the trained merges b1..bN in
    * rank order. `extraCols` are carried through (e.g. "source" for
    * the packing consumer). Ends without a trailing comma — callers
    * append their final SELECT. */
  def bpeDocChainSql(n: Int, extraCols: String = ""): String = {
    val sep = "chr(31)"
    def u(x: String) = s"$sep || $x || $sep"
    val ec = if (extraCols.isEmpty) "" else s"$extraCols, "
    val sb = new StringBuilder
    sb.append(bpeChainSql(n))
    sb.append(
      s""",
         |ds0 AS (
         |  SELECT ${ec}doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
         |      AS BIGINT) AS n_tokens,
         |    COALESCE(array_to_string(list_transform(
         |      list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
         |        t -> NOT contains(t, $sep)),
         |      t -> substr($sep || regexp_replace(t, '(?s)(.)',
         |        '\\1' || $sep || $sep, 'g'), 1, 3 * length(t))),
         |      chr(30)), '') AS seg
         |  FROM documents),
         |""".stripMargin)
    for (r <- 1 to n) {
      sb.append(
        s"""ds$r AS (
           |  SELECT ${ec}doc_id, n_tokens,
           |    replace(seg, ${u("l")} || ${u("r")}, ${u("l || r")}) AS seg
           |  FROM ds${r - 1}, b$r),
           |""".stripMargin)
    }
    sb.setLength(sb.length - 2)
    sb.toString
  }

  /** Shared curation-funnel oracle PREFIX (the p15/p18 stages): exact
    * dedup keep-first (`keep`/`dd`) and 4-gram eval decontamination
    * (`toks`/`g4`/`gh`/`ev`/`flagged` — eval slice = doc_id % 97 = 0;
    * `flagged` = non-eval docs sharing a 4-gram hash with it). Starts
    * with WITH and ends WITHOUT a trailing comma — callers append
    * their consuming CTEs. `dd` carries `source` for domain-aware
    * consumers (p18); p15's stages simply never read it. */
  def curationPrefixSql: String =
    """WITH keep AS (
      |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |dd AS (SELECT d.doc_id, d.source, d.text FROM documents d
      |       JOIN keep USING (doc_id)),
      |toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      |  FROM dd),
      |g4 AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(ts) >= 4 THEN
      |    list_transform(generate_series(1, len(ts) - 3), i ->
      |      ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])
      |    ELSE [] END)) AS g
      |  FROM toks),
      |gh AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh FROM g4),
      |ev AS (SELECT DISTINCT gh FROM gh WHERE doc_id % 97 = 0),
      |flagged AS (
      |  SELECT DISTINCT doc_id FROM gh
      |  WHERE doc_id % 97 <> 0 AND gh IN (SELECT gh FROM ev))""".stripMargin

  /** The p17-family oracle (DSIR, Xie et al. 2023): hashed-bigram
    * buckets per doc (the engine-wide 60-bit md5 gate mod `buckets`),
    * add-one-smoothed bucket models over two CALLER-DEFINED CTEs
    * `dsir_target(doc_id, text)` and `dsir_raw(doc_id, text)` — a CTE
    * FRAGMENT (no leading WITH) so the corpora can themselves be the
    * output of earlier relational stages (p18 feeds the deduped +
    * decontaminated pool in). Ends with a
    * `scored(doc_id, n_bigrams, logw)` CTE over the raw pool; callers
    * append their final SELECT (p17 dumps it, p17b/p18 add the Gumbel
    * key). The ln expression order matches
    * [[graft.operators.Dsir.importanceLogRatios]] exactly — one ln per
    * model, add-one numerator, `tot + B` denominator. `rawSampleMod`
    * folds the deterministic raw-fit subsample gate into the rc/rt
    * CTEs (the p17c form — scoring still sees every raw doc). */
  def dsirScoredSql(buckets: Int, rawSampleMod: Int = 1,
      includeUnigrams: Boolean = false): String = {
    val bigram = (ts: String) =>
      s"('0x' || substr(md5($ts[i] || ' ' || $ts[i+1]), 1, 15))" +
        s"::BIGINT % $buckets"
    val unigram = (ts: String) =>
      s"('0x' || substr(md5($ts[i]), 1, 15))::BIGINT % $buckets"
    // the per-doc feature-bucket list: bigrams only (the engine
    // default), or the paper-faithful unigram ∪ bigram bag — unigrams
    // FIRST, matching the Spark side's in-row fold order
    val feats = (ts: String) =>
      if (includeUnigrams)
        s"""list_concat(
           |    list_transform(range(1, len($ts) + 1), i -> ${unigram(ts)}),
           |    list_transform(range(1, len($ts)), i -> ${bigram(ts)}))"""
          .stripMargin
      else s"list_transform(range(1, len($ts)), i -> ${bigram(ts)})"
    val nCol = if (includeUnigrams) "n_features" else "n_bigrams"
    val fitGate =
      if (rawSampleMod == 1) ""
      else s"""
         | WHERE ('0x' || substr(md5('dsirfit:' ||
         |   CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $rawSampleMod = 0"""
        .stripMargin
    s"""t_tk AS (
       |  SELECT list_filter(string_split(COALESCE(text, ''), ' '),
       |           x -> x <> '') AS ts
       |  FROM dsir_target),
       |tb AS (SELECT unnest(${feats("ts")}) AS b FROM t_tk),
       |tc AS (SELECT b, COUNT(*) AS c FROM tb GROUP BY 1),
       |tt AS (SELECT COUNT(*) AS t FROM tb),
       |r_bk AS (
       |  SELECT doc_id, ${feats("ts")} AS bs
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(COALESCE(text, ''), ' '),
       |            x -> x <> '') AS ts
       |        FROM dsir_raw)),
       |rb AS (SELECT unnest(bs) AS b FROM r_bk$fitGate),
       |rc AS (SELECT b, COUNT(*) AS c FROM rb GROUP BY 1),
       |rt AS (SELECT COUNT(*) AS t FROM rb),
       |lr AS (
       |  SELECT g.b,
       |    ln((COALESCE(tc.c, 0) + 1.0) / (tt.t + $buckets)) -
       |    ln((COALESCE(rc.c, 0) + 1.0) / (rt.t + $buckets)) AS lr
       |  FROM (SELECT unnest(range(0, $buckets)) AS b) g
       |  LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)
       |  CROSS JOIN tt CROSS JOIN rt),
       |ex AS (SELECT doc_id, unnest(bs) AS b FROM r_bk),
       |sums AS (SELECT e.doc_id, SUM(l.lr) AS w
       |         FROM ex e JOIN lr l USING (b) GROUP BY 1),
       |scored AS (
       |  SELECT k.doc_id, CAST(len(k.bs) AS BIGINT) AS $nCol,
       |    COALESCE(s.w, 0.0) AS logw
       |  FROM r_bk k LEFT JOIN sums s USING (doc_id))""".stripMargin
  }

  /** The Gumbel top-k final SELECT over [[dsirScoredSql]]'s `scored`
    * CTE — key = logw − ln(−ln(u)) with the salted 32-bit md5 uniform,
    * matching [[graft.operators.Dsir.gumbelResample]] term for term. */
  def dsirGumbelSelect(k: Int, salt: String = "dsir"): String = {
    val s = "'" + salt.replace("'", "''") + ":'"
    s"""SELECT doc_id, logw,
       |  logw - ln(-ln((('0x' || substr(md5($s ||
       |    CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 4294967296
       |    + 0.5) / 4294967296.0)) AS g
       |FROM scored ORDER BY g DESC, doc_id LIMIT $k""".stripMargin
  }
}
