package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Second wave of LLM-training-pipeline operators over `documents`:
  * repetition-quality signals, PII detection/redaction, deterministic
  * dataset splitting and stratified sampling, and TF-IDF keyword
  * extraction. Like TextOps, every operator is a pure Catalyst plan (no
  * UDFs) with a bit-exact DuckDB oracle.
  *
  * Scale notes (100 TB design):
  *  - repetition / PII / splitting are single-pass map-side shapes: per-doc
  *    aggregates explode once and combine map-side (explode + hash-agg), or
  *    are pure projections — no corpus-wide shuffle beyond the per-doc key;
  *  - stratified sampling windows PARTITION BY the stratum (never a global
  *    window), so each stratum's top-k is one partition-local sort;
  *  - TF-IDF's document-frequency relation is a token dictionary — orders of
  *    magnitude smaller than the corpus — and joins broadcast; the top-k
  *    window partitions by doc_id.
  *
  * Float determinism: scores only use IEEE-correctly-rounded ops (`/`, `*`)
  * over identical operands in both engines — no `ln`/`exp`, whose libm
  * implementations are not guaranteed identical across engines (that is why
  * tfidf uses the rational idf (N+1)/(df+1) rather than log idf).
  */
object PipelineOps {

  private def sq(s: SparkSession, d: String, sql: String): DataFrame = {
    Tables.ensureView(s, d, "documents")(Tables.documents(s, d))
    s.sql(sql)
  }

  // --- Gopher-style repetition signals -------------------------------------
  // (In the spirit of Rae et al. 2021 §A1.1's duplicate/top n-gram quality
  // filters. NOTE: the paper's n>=2 fractions weigh duplicated n-grams by
  // CHARACTER mass; these are token-count fractions over bigram
  // occurrences — a self-consistent approximation, oracle-checked, chosen
  // to keep the signal a pure count aggregate.)
  // Shape: tokenize once, explode, two map-side-combinable hash-aggs
  // (unigram + bigram), LEFT-join per doc — a document with fewer than two
  // tokens has no bigrams and keeps NULL bigram fractions rather than
  // vanishing from the quality table.
  private val repetitionSpark: String =
    """WITH toks AS (
      |  SELECT doc_id, split(text, ' ') AS a FROM documents),
      |uni AS (
      |  SELECT doc_id, tok, COUNT(1) AS c
      |  FROM (SELECT doc_id, explode(a) AS tok FROM toks)
      |  GROUP BY doc_id, tok),
      |uniagg AS (
      |  SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_tok,
      |         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_toks
      |  FROM uni GROUP BY doc_id),
      |bi AS (
      |  SELECT doc_id, bg, COUNT(1) AS c
      |  FROM (SELECT doc_id, explode(CASE WHEN size(a) >= 2
      |          THEN transform(sequence(1, size(a) - 1),
      |                         i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))
      |          ELSE array() END) AS bg
      |        FROM toks)
      |  GROUP BY doc_id, bg),
      |biagg AS (
      |  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram,
      |         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bigrams
      |  FROM bi GROUP BY doc_id)
      |SELECT u.doc_id, u.n_tokens,
      |  CAST(u.top_tok AS DOUBLE) / u.n_tokens AS top_token_frac,
      |  CAST(u.dup_toks AS DOUBLE) / u.n_tokens AS dup_token_frac,
      |  CAST(b.top_bigram AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
      |  CAST(b.dup_bigrams AS DOUBLE) / b.n_bigrams AS dup_bigram_frac
      |FROM uniagg u LEFT JOIN biagg b ON u.doc_id = b.doc_id
      |ORDER BY u.doc_id""".stripMargin

  private val repetitionDuck: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      |uni AS (
      |  SELECT doc_id, tok, COUNT(1) AS c
      |  FROM (SELECT doc_id, UNNEST(a) AS tok FROM toks)
      |  GROUP BY doc_id, tok),
      |uniagg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_tok,
      |         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_toks
      |  FROM uni GROUP BY doc_id),
      |bi AS (
      |  SELECT doc_id, bg, COUNT(1) AS c
      |  FROM (SELECT doc_id,
      |          UNNEST(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i + 1])) AS bg
      |        FROM toks)
      |  GROUP BY doc_id, bg),
      |biagg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_bigram,
      |         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_bigrams
      |  FROM bi GROUP BY doc_id)
      |SELECT u.doc_id, u.n_tokens,
      |  CAST(u.top_tok AS DOUBLE) / u.n_tokens AS top_token_frac,
      |  CAST(u.dup_toks AS DOUBLE) / u.n_tokens AS dup_token_frac,
      |  CAST(b.top_bigram AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
      |  CAST(b.dup_bigrams AS DOUBLE) / b.n_bigrams AS dup_bigram_frac
      |FROM uniagg u LEFT JOIN biagg b ON u.doc_id = b.doc_id
      |ORDER BY u.doc_id""".stripMargin

  // --- PII detection + redaction -------------------------------------------
  // The synthetic corpus carries no natural PII, so (like TextOps.corpusSql
  // injects duplicates) a deterministic CTE injects emails / IPv4s / phone
  // numbers keyed off doc_id, computed identically in both dialects. The
  // regexes use only ASCII classes, `\b`, and bounded repetition — the
  // subset where Java regex (Spark) and RE2 (DuckDB) provably agree; no
  // lookaround or backreferences (RE2 has neither).
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\b555-\\d{4}\\b"

  /** Spark string literals see one escape level more than DuckDB's. */
  private def lit(re: String, spark: Boolean): String =
    if (spark) re.replace("\\", "\\\\") else re

  private def piiSql(spark: Boolean): String = {
    val (castStr, sizeFn, extractSuffix, replaceSuffix) =
      if (spark) ("STRING", "size", ", 0)", ")") else ("VARCHAR", "len", ")", ", 'g')")
    val (e, i, p) = (lit(emailRe, spark), lit(ipRe, spark), lit(phoneRe, spark))
    s"""WITH pii_corpus AS (
       |  SELECT doc_id, concat(text,
       |    CASE WHEN doc_id % 7 = 0
       |      THEN concat(' contact user', CAST(doc_id AS $castStr), '@example.com') ELSE '' END,
       |    CASE WHEN doc_id % 11 = 0
       |      THEN concat(' from 10.0.', CAST(doc_id % 256 AS $castStr), '.42') ELSE '' END,
       |    CASE WHEN doc_id % 13 = 0
       |      THEN concat(' call 555-', CAST(1000 + doc_id % 9000 AS $castStr)) ELSE '' END) AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST($sizeFn(regexp_extract_all(text, '$e'$extractSuffix) AS BIGINT) AS n_emails,
       |  CAST($sizeFn(regexp_extract_all(text, '$i'$extractSuffix) AS BIGINT) AS n_ips,
       |  CAST($sizeFn(regexp_extract_all(text, '$p'$extractSuffix) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |      '$e', '<EMAIL>'$replaceSuffix,
       |      '$i', '<IP>'$replaceSuffix,
       |      '$p', '<PHONE>'$replaceSuffix) AS redacted_hash
       |FROM pii_corpus
       |ORDER BY doc_id""".stripMargin
  }

  // --- Deterministic train/valid/test split --------------------------------
  // Hash-based splitting (the standard reproducible-split idiom): the first
  // md5 hex nibble of the key buckets 12/2/2 of 16 into train/valid/test.
  // Pure projection + one hash-agg: membership is a function of the row key
  // alone, so the split is stable under reruns, repartitioning, and
  // incremental appends — the property that matters at 100 TB.
  private def splitSql(spark: Boolean): String = {
    val castStr = if (spark) "STRING" else "VARCHAR"
    // membership digest: bit_xor of per-doc md5 prefixes — O(1) aggregate
    // state, map-side-combinable, order-independent; a sorted collect_list
    // per split is driver-sized at 100 TB (a split holds most of the corpus)
    val membersHash =
      s"bit_xor(${CrossEngine.hash60(spark, s"CAST(doc_id AS ${CrossEngine.strType(spark)})")})"
    s"""WITH splits AS (
       |  SELECT doc_id,
       |    CASE WHEN substring(md5(CAST(doc_id AS $castStr)), 1, 1) < 'c' THEN 'train'
       |         WHEN substring(md5(CAST(doc_id AS $castStr)), 1, 1) < 'e' THEN 'valid'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |SELECT split, COUNT(1) AS n_docs, MIN(doc_id) AS min_doc_id,
       |  MAX(doc_id) AS max_doc_id, $membersHash AS members_hash
       |FROM splits GROUP BY split ORDER BY split""".stripMargin
  }

  // --- Deterministic stratified sample (k per stratum) ---------------------
  // TWO-PHASE selection: a stratum is a handful of values (lang), so one
  // window per stratum means one task sorts a whole stratum — at 100 TB a
  // dominant language funnels most of the corpus into a single sort task.
  // The salted pre-window (PARTITION BY lang, doc_id % 32) picks a local
  // top-k per salt bucket; the per-stratum window then sees at most
  // 32 x k rows. Provably the same k rows: the order (md5, doc_id) is
  // total, and every global top-k member is in its salt bucket's top-k.
  // (sample_hash's collect_list is k-bounded per stratum — fine at scale.)
  private val stratifiedK = 20
  private def stratifiedSql(spark: Boolean): String = {
    val castStr = if (spark) "STRING" else "VARCHAR"
    val sampleHash =
      if (spark)
        "md5(concat_ws(',', transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING))))"
      else
        "md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))"
    s"""WITH pre AS (
       |  SELECT doc_id, lang,
       |    ROW_NUMBER() OVER (PARTITION BY lang, doc_id % 32
       |                       ORDER BY md5(CAST(doc_id AS $castStr)), doc_id) AS rn1
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, lang,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |                       ORDER BY md5(CAST(doc_id AS $castStr)), doc_id) AS rn
       |  FROM pre WHERE rn1 <= $stratifiedK)
       |SELECT lang, COUNT(1) AS n_sampled, $sampleHash AS sample_hash
       |FROM ranked WHERE rn <= $stratifiedK
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // --- TF-IDF top-3 keywords per document ----------------------------------
  // tf and df are both map-side-combinable hash-aggs; the tf-df join
  // strategy is deliberately unhinted: AQE's runtime stats broadcast the
  // df dictionary when it is actually small and fall back to a shuffle
  // join when the vocabulary outgrows the broadcast limit (a forced
  // broadcast would hard-fail there; in the shuffle regime AQE's
  // skew-join split handles stopword-key skew). The top-k window
  // partitions by doc_id —
  // corpus-many partitions, no funnel. Rational idf (N+1)/(df+1) keeps
  // the score inside IEEE-correctly-rounded ops (see object scaladoc).
  // Inline tf CTE, deliberately: the r15-opt materialization was
  // A/B-adjudicated a REAL regression in r16 — isolated min-of-5 on one
  // box, r15-build inline 0.811 s vs materialized 1.013 s (persist mode
  // 1.080 s). The tf relation is corpus-token-sized; writing and
  // re-reading it costs more than re-running the tokenize+count pass.
  private def tfidfImpl(s: SparkSession, d: String): DataFrame = {
    Tables.ensureView(s, d, "documents")(Tables.documents(s, d))
    s.sql(tfidfSql("explode(split(text, ' '))"))
  }

  private def tfidfSql(explodeExpr: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, $explodeExpr AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(1) AS tf FROM toks GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(1) AS df FROM tf GROUP BY term),
       |n AS (SELECT COUNT(1) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)) AS tfidf
       |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, tf, df, tfidf,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
       |  FROM scored)
       |SELECT doc_id, rk, term, tf, df, tfidf
       |FROM ranked WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin

  // --- C4/Gopher-style heuristic quality filters ---------------------------
  // (the rule bundle of Raffel et al. 2020 §2.2 / Rae et al. 2021 §A1.1,
  // restricted to rules expressible with engine-portable string ops:
  // terminal punctuation, mean word length in [3,10], symbol ratio,
  // stopword presence, minimum length. One tokenize-once aggregate plus a
  // doc-keyed join; the per-rule booleans are exposed alongside the
  // combined keep flag so a pipeline can tune rule-by-rule.)
  private def c4Sql(spark: Boolean): String = {
    val explodeToks =
      if (spark) "explode(split(text, ' '))"
      else "UNNEST(string_split(text, ' '))"
    def cnt(ch: String) = s"length(text) - length(replace(text, '$ch', ''))"
    // NULLIF pins empty-document semantics: Spark's x/0 yields NULL but
    // DuckDB's double division yields inf — NULLIF makes both NULL.
    val textLen = "NULLIF(length(d.text), 0)"
    s"""WITH toks AS (
       |  SELECT doc_id, $explodeToks AS tok FROM documents),
       |agg AS (
       |  SELECT doc_id, COUNT(1) AS n_tokens,
       |         CAST(SUM(length(tok)) AS BIGINT) AS n_tok_chars
       |  FROM toks GROUP BY doc_id)
       |SELECT d.doc_id,
       |  a.n_tokens,
       |  CAST(a.n_tok_chars AS DOUBLE) / a.n_tokens AS mean_word_len,
       |  right(d.text, 1) IN ('.', '!', '?') AS ends_terminal,
       |  CAST(${cnt("#")} + ${cnt("@")} AS DOUBLE) / $textLen AS symbol_ratio,
       |  contains(concat(' ', d.text, ' '), ' the ')
       |    OR contains(concat(' ', d.text, ' '), ' and ')
       |    OR contains(concat(' ', d.text, ' '), ' of ') AS has_stopword,
       |  (right(d.text, 1) IN ('.', '!', '?')
       |    AND CAST(a.n_tok_chars AS DOUBLE) / a.n_tokens BETWEEN 3 AND 10
       |    AND CAST(${cnt("#")} + ${cnt("@")} AS DOUBLE) / $textLen < 0.01
       |    AND (contains(concat(' ', d.text, ' '), ' the ')
       |      OR contains(concat(' ', d.text, ' '), ' and ')
       |      OR contains(concat(' ', d.text, ' '), ' of '))
       |    AND a.n_tokens >= 5) AS keep
       |FROM documents d JOIN agg a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  // --- Token-window chunking ------------------------------------------------
  // Context-window preparation: split each document into overlapping
  // fixed-size token windows (size 32, stride 24 → 8-token overlap), the
  // standard pre-tokenization shape for embedding models and long-document
  // training. Pure projection + bounded explode (≤ n/stride chunks per
  // doc) — embarrassingly parallel, no shuffle, chunk construction stays
  // inside whole-stage codegen. The window sequence stops at the first
  // start whose window reaches the end of the document (the standard
  // sliding-window convention: the last chunk covers the tail; no
  // redundant sub-window tail chunks), so every chunk except the last is
  // exactly `chunkSize` tokens. `greatest(..., 0)` pins short/empty
  // documents to one chunk in both engines instead of Spark's DESCENDING
  // sequence(0, -1).
  private val chunkSize = 32
  private val chunkStride = 24
  private def chunkSql(spark: Boolean): String = {
    val split = if (spark) "split(text, ' ')" else "string_split(text, ' ')"
    val len = if (spark) "size" else "len"
    val nChunksM1 =
      s"CAST(ceil(CAST(greatest(n - $chunkSize, 0) AS DOUBLE) / $chunkStride) AS BIGINT)"
    val gen =
      if (spark) s"explode(sequence(0L, $nChunksM1))"
      else s"UNNEST(range(0, $nChunksM1 + 1))"
    val slice =
      if (spark) s"slice(w, ci * $chunkStride + 1, $chunkSize)"
      else s"list_slice(w, ci * $chunkStride + 1, ci * $chunkStride + $chunkSize)"
    val join = if (spark) "array_join(ch, ' ')" else "array_to_string(ch, ' ')"
    s"""WITH toks AS (
       |  SELECT doc_id, w, $len(w) AS n
       |  FROM (SELECT doc_id, $split AS w FROM documents)),
       |idx AS (
       |  SELECT doc_id, w, $gen AS ci FROM toks),
       |chunks AS (
       |  SELECT doc_id, ci, $slice AS ch FROM idx)
       |SELECT doc_id, CAST(ci AS INT) AS chunk_id,
       |  CAST($len(ch) AS INT) AS n_tokens, $join AS chunk_text
       |FROM chunks
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  // --- Sequence packing ------------------------------------------------------
  // Training-sequence packing: assign each document a (bucket, seq_id,
  // seq_offset) placement in a stream of fixed-length (512-token)
  // sequences. Packing is cumulative (inherently sequential), so it is
  // bucketed: 256 deterministic md5 shards, each packed independently by
  // one running-sum window — the shape a 100 TB pipeline uses for its
  // output shards (a GLOBAL cumsum would serialize the corpus through one
  // task; per-shard streams are how packed pretraining data is actually
  // laid out). All arithmetic is integer/exact-double, bit-identical in
  // both engines.
  private val packSeqLen = 512
  private def packSql(spark: Boolean): String = {
    val castStr = if (spark) "STRING" else "VARCHAR"
    val len = if (spark) "size" else "len"
    val split = if (spark) "split(text, ' ')" else "string_split(text, ' ')"
    val bucket = CrossEngine.hexDigest(
      spark, s"CAST(doc_id AS ${CrossEngine.strType(spark)})", width = 2, castTo = "INT")
    s"""WITH toks AS (
       |  SELECT doc_id, $bucket AS bucket,
       |    CAST($len($split) AS BIGINT) AS n_tokens,
       |    md5(CAST(doc_id AS $castStr)) AS ordkey
       |  FROM documents),
       |placed AS (
       |  SELECT doc_id, bucket, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY ordkey, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
       |  FROM toks)
       |SELECT doc_id, bucket,
       |  CAST(floor(CAST(start_tok AS DOUBLE) / $packSeqLen) AS INT) AS seq_id,
       |  CAST(start_tok % $packSeqLen AS INT) AS seq_offset,
       |  n_tokens
       |FROM placed
       |ORDER BY doc_id""".stripMargin
  }

  // --- Weighted (PPS) source-rebalancing sample ----------------------------
  // The data-mixing primitive: sample each source at its OWN rate so the
  // output mix hits a target composition — here "balanced": ~10 docs per
  // source regardless of source size (rate_s = k / n_s), the uniform
  // special case of temperature-flattened mixing (rate_s ∝ (n_s/N)^(α-1);
  // any α only changes the one-row-per-source threshold arithmetic).
  // Inclusion is a pure key predicate — hash60(doc) under a per-source
  // integer threshold — so membership is deterministic, append-stable,
  // and engine-identical (the sample_split discipline, with a per-group
  // rate instead of a global one). Counts are Poisson-distributed around
  // k, not exact-k: PPS semantics, no per-source sort or window. The
  // per-source threshold relation is dictionary-sized and broadcast;
  // the filter itself is map-side.
  private val weightedTargetPerSource = 10
  private def weightedSql(spark: Boolean): String = {
    val h = CrossEngine.hash60(spark, "CONCAT('w:', doc_id)")
    s"""WITH counts AS (SELECT source, COUNT(1) AS n_s FROM documents GROUP BY source),
       |thr AS (
       |  SELECT source, n_s,
       |    CAST(floor(($weightedTargetPerSource.0 / CAST(n_s AS DOUBLE)) * 1000000.0)
       |         AS BIGINT) AS thr
       |  FROM counts)
       |SELECT d.doc_id, d.source, t.thr
       |FROM documents d JOIN thr t ON d.source = t.source
       |WHERE $h % 1000000 < t.thr
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Semi-structured extraction over the events `props` JSON column:
    * path-extract + typed cast + per-type rollup. Spark's
    * `get_json_object` is a codegen'd expression evaluated inside the
    * scan's project — at 100 TB the extraction is a map-side pass and the
    * only shuffle is the tiny per-type partial aggregate. (DuckDB oracle
    * spells the same path extract `json_extract_string`.)
    */
  private def jsonExtractImpl(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, get_json_object, max, sum}
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"), count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  private val jsonExtractOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Schema-based JSON decode (`from_json` with a declared struct — the
    * typed-ingestion counterpart of path extraction): malformed documents
    * become NULL structs, counted explicitly. Same map-side shape as
    * [[jsonExtractImpl]].
    */
  private def jsonSchemaImpl(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, from_json, sum}
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).as("j"))
      .groupBy("event_type")
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"),
        count(col("j.k")).as("n_parsed"),
        sum(col("j.k")).as("sum_k"))
      .orderBy("event_type")
  }

  private val jsonSchemaOracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_parsed,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- Training-mix planning (source mixture weights) ----------------------
  // In the spirit of published LLM data recipes (The Pile's weighted
  // source mixing, Gao et al. 2020 §2; LLaMA's sampling proportions,
  // Touvron et al. 2023 Table 1): given target per-source weights, size
  // the LARGEST mixture achievable without upsampling any source
  // (nmix = min_s mass_s / weight_s), then report each source's take and
  // sampling rate. Weights derive deterministically from the source name
  // (1 + index%4, normalized) so both engines compute them from data.
  //
  // 100 TB shape: ONE map-side-combinable keyed aggregate over the
  // corpus; everything after operates on |sources| rows (a window over a
  // ~20-row relation, not the corpus). Float determinism: the weight sum
  // is an integer-valued double (exact in any order), and every quotient/
  // product is a correctly-rounded IEEE op over identical operands, so
  // the engines agree bit-for-bit.
  private val mixtureSql: String =
    """WITH c AS (
      |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY source
      |), w AS (
      |  SELECT source, chars,
      |    CAST(1 AS DOUBLE) + CAST(CAST(SUBSTR(source, 4) AS INT) % 4 AS DOUBLE) AS w_raw
      |  FROM c
      |), n AS (
      |  SELECT source, chars,
      |    w_raw / SUM(w_raw) OVER () AS tw,
      |    CAST(chars AS DOUBLE) / (w_raw / SUM(w_raw) OVER ()) AS cap
      |  FROM w
      |), m AS (
      |  SELECT source, chars, tw, MIN(cap) OVER () AS nmix FROM n
      |)
      |SELECT source, chars,
      |  ROUND(tw, 6) AS target_weight,
      |  CAST(FLOOR(tw * nmix) AS BIGINT) AS take_chars,
      |  ROUND(tw * nmix / chars, 6) AS sample_rate
      |FROM m ORDER BY source""".stripMargin

  // --- Deterministic per-epoch shuffle sharding ---------------------------
  // The training-loader prep step: every epoch re-shuffles the corpus into
  // S shard files, each internally ordered — both the assignment and the
  // order must be REPRODUCIBLE (resume a crashed epoch, re-generate shard
  // k alone) and epoch-dependent (hash of doc#epoch, never a stateful
  // RNG). Scale shape: shard/order keys are pure projections; the one
  // window partitions by (epoch, shard) — corpus/S rows per partition,
  // never the single-task global sort a naive ROW_NUMBER() OVER (ORDER BY
  // hash) would be; the per-shard rollup is a combinable aggregate whose
  // order digest (bit_xor of doc:pos hashes, O(1) state) pins the exact
  // intra-shard sequence cross-engine without materializing it.
  private def epochShuffleSql(spark: Boolean): String = {
    val st = CrossEngine.strType(spark)
    val epochs =
      if (spark) "SELECT explode(sequence(0, 2)) AS epoch"
      else "SELECT UNNEST(range(0, 3)) AS epoch"
    val key = s"CAST(doc_id AS $st) || '#' || CAST(epoch AS $st)"
    val shard = s"${CrossEngine.hexDigest(spark, key, 2, "INT")} % 64"
    val ord = CrossEngine.hash60(spark, key)
    val posDigest = CrossEngine.hash60(spark,
      s"CAST(doc_id AS $st) || ':' || CAST(pos AS $st)")
    s"""WITH e AS ($epochs),
       |a AS (
       |  SELECT e.epoch, d.doc_id, $shard AS shard, $ord AS ok
       |  FROM documents d CROSS JOIN e),
       |p AS (
       |  SELECT epoch, doc_id, shard,
       |    ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY ok, doc_id) AS pos
       |  FROM a)
       |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS INT) AS shard,
       |  COUNT(1) AS n_docs,
       |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id,
       |  bit_xor($posDigest) AS order_digest
       |FROM p GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin
  }

  private val qs: Map[String, QueryDef] = Map(
    "pipeline_epoch_shuffle" -> QueryDef(
      (s, d) => sq(s, d, epochShuffleSql(spark = true)), epochShuffleSql(spark = false)),
    "pipeline_mixture_weights" -> QueryDef(
      (s, d) => sq(s, d, mixtureSql), mixtureSql),
    "events_json_extract" -> QueryDef(jsonExtractImpl _, jsonExtractOracle),
    "events_json_schema" -> QueryDef(jsonSchemaImpl _, jsonSchemaOracle),
    "sample_weighted" -> QueryDef(
      (s, d) => sq(s, d, weightedSql(spark = true)), weightedSql(spark = false)),
    "text_chunk_windows" -> QueryDef(
      (s, d) => sq(s, d, chunkSql(spark = true)), chunkSql(spark = false)),
    "pipeline_pack_sequences" -> QueryDef(
      (s, d) => sq(s, d, packSql(spark = true)), packSql(spark = false)),
    "text_c4_filters" -> QueryDef(
      (s, d) => sq(s, d, c4Sql(spark = true)), c4Sql(spark = false)),
    "text_repetition" -> QueryDef(
      (s, d) => sq(s, d, repetitionSpark), repetitionDuck),
    "text_pii" -> QueryDef(
      (s, d) => sq(s, d, piiSql(spark = true)), piiSql(spark = false)),
    "sample_split" -> QueryDef(
      (s, d) => sq(s, d, splitSql(spark = true)), splitSql(spark = false)),
    "sample_stratified" -> QueryDef(
      (s, d) => sq(s, d, stratifiedSql(spark = true)), stratifiedSql(spark = false)),
    "text_tfidf" -> QueryDef(
      tfidfImpl _,
      tfidfSql("UNNEST(string_split(text, ' '))"))
  )

  def queries: Map[String, QueryDef] = qs
}
