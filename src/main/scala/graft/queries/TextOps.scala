package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-training-pipeline surface (BASELINE.json north-star) layered on
  * the same engine. All operators are pure Catalyst plans (no UDFs): string
  * shingling via `sequence`/`transform`/`substring`, set ops via higher-order
  * array functions, hashing via `md5`. Each has a DuckDB oracle mirroring
  * the exact semantics.
  *
  * Scale notes (100 TB design):
  *  - exact dedup = hash-shuffle on md5(text): one shuffle, map-side combine;
  *  - MinHash LSH = candidates come only from band-bucket collisions
  *    (shuffle keyed by 16-byte band hash), exact Jaccard verified only for
  *    candidate pairs — never all-pairs;
  *  - blocked n-gram Jaccard = all-pairs restricted to (lang, source)
  *    blocks, the classic blocking strategy when metadata partitions the
  *    corpus.
  */
object TextOps {

  /** Register `documents` (and a dup-injected `corpus`) as temp views. */
  private def prep(s: SparkSession, d: String): Unit = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
  }

  /** Corpus with deterministic injected duplicates so exact-dedup output is
    * non-trivial: every doc_id % 10 == 0 doc is re-inserted with id+100000.
    */
  private val corpusSql: String =
    """SELECT doc_id, text, lang, source, n_chars FROM documents
      |UNION ALL
      |SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  // ---- MinHash SQL generation (shared shape, per-dialect functions) -----
  private val numSeeds = 16
  private val bandSize = 4
  private val numBands = numSeeds / bandSize

  /** Per-seed min-hash aggregate expressions: lexicographic min over the
    * md5 hex of (seed ':' shingle) — a portable stand-in for integer
    * min-hashing that both engines compute identically.
    */
  private def minhashAggs: String =
    (0 until numSeeds)
      .map(i => s"MIN(md5(CONCAT('s$i:', shingle))) AS m$i")
      .mkString(",\n    ")

  private def bandExprs: String =
    (0 until numBands).map { b =>
      val cols = (0 until bandSize).map(j => s"m${b * bandSize + j}").mkString(", ")
      s"md5(CONCAT($cols)) AS band$b"
    }.mkString(",\n    ")

  private def bandCandidateUnion: String =
    (0 until numBands)
      .map(b => s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                   |  FROM sigs a JOIN sigs b ON a.band$b = b.band$b AND a.doc_id < b.doc_id""".stripMargin)
      .mkString("\nUNION\n")

  /** 5-char shingles, Spark dialect. */
  private val sparkShingles: String =
    """SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, explode(transform(sequence(1, greatest(length(text) - 4, 1)),
      |                                   i -> substring(text, i, 5))) AS shingle
      |  FROM documents)""".stripMargin

  /** 5-char shingles, DuckDB dialect. */
  private val duckShingles: String =
    """SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, substring(text, i, 5) AS shingle
      |  FROM documents, UNNEST(range(1, greatest(length(text) - 4, 1) + 1)) AS t(i))""".stripMargin

  private def minhashSql(shingles: String): String =
    s"""WITH shingles AS ($shingles),
       |sizes AS (SELECT doc_id, COUNT(1) AS n_shingles FROM shingles GROUP BY doc_id),
       |sigs0 AS (
       |  SELECT doc_id,
       |    $minhashAggs
       |  FROM shingles GROUP BY doc_id),
       |sigs AS (
       |  SELECT doc_id,
       |    $bandExprs
       |  FROM sigs0),
       |candidates AS (
       |$bandCandidateUnion
       |),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(1) AS n_inter
       |  FROM candidates c
       |  JOIN shingles sa ON sa.doc_id = c.doc_a
       |  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |  CAST(i.n_inter AS DOUBLE) / (za.n_shingles + zb.n_shingles - i.n_inter) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE CAST(i.n_inter AS DOUBLE) / (za.n_shingles + zb.n_shingles - i.n_inter) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Blocked exact n-gram Jaccard: all pairs within a (lang, source) block. */
  private def blockedJaccardSql(shinglesWithBlock: String): String =
    s"""WITH shingles AS ($shinglesWithBlock),
       |sizes AS (SELECT doc_id, COUNT(1) AS n_shingles FROM shingles GROUP BY doc_id),
       |inter AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(1) AS n_inter
       |  FROM shingles sa
       |  JOIN shingles sb ON sa.lang = sb.lang AND sa.source = sb.source
       |    AND sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
       |  GROUP BY sa.doc_id, sb.doc_id)
       |SELECT i.doc_a, i.doc_b,
       |  CAST(i.n_inter AS DOUBLE) / (za.n_shingles + zb.n_shingles - i.n_inter) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |WHERE CAST(i.n_inter AS DOUBLE) / (za.n_shingles + zb.n_shingles - i.n_inter) >= 0.4
       |ORDER BY doc_a, doc_b""".stripMargin

  private val sparkShinglesBlocked: String =
    """SELECT DISTINCT doc_id, lang, source, shingle FROM (
      |  SELECT doc_id, lang, source,
      |    explode(transform(sequence(1, greatest(length(text) - 4, 1)),
      |                      i -> substring(text, i, 5))) AS shingle
      |  FROM documents)""".stripMargin

  private val duckShinglesBlocked: String =
    """SELECT DISTINCT doc_id, lang, source, shingle FROM (
      |  SELECT doc_id, lang, source, substring(text, i, 5) AS shingle
      |  FROM documents, UNNEST(range(1, greatest(length(text) - 4, 1) + 1)) AS t(i))""".stripMargin

  private def sq(s: SparkSession, d: String, sql: String): DataFrame = {
    prep(s, d); s.sql(sql)
  }

  private val qs: Map[String, QueryDef] = Map(
    // --- exact dedup: hash-groupBy, keep lowest doc_id ---------------------
    "dedup_exact" -> QueryDef(
      (s, d) => sq(s, d,
        s"""WITH corpus AS ($corpusSql)
           |SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id,
           |       COUNT(1) AS n_copies
           |FROM corpus
           |GROUP BY md5(text)
           |HAVING COUNT(1) > 1
           |ORDER BY text_hash""".stripMargin),
      s"""WITH corpus AS ($corpusSql)
         |SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id,
         |       COUNT(1) AS n_copies
         |FROM corpus
         |GROUP BY md5(text)
         |HAVING COUNT(1) > 1
         |ORDER BY text_hash""".stripMargin
    ),

    // --- token counting ----------------------------------------------------
    "text_token_stats" -> QueryDef(
      (s, d) => sq(s, d,
        """SELECT doc_id,
          |  size(split(text, ' ')) AS n_tokens,
          |  size(array_distinct(split(text, ' '))) AS n_distinct_tokens,
          |  length(replace(text, ' ', '')) AS n_word_chars,
          |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(split(text, ' ')) AS avg_token_len
          |FROM documents
          |ORDER BY doc_id""".stripMargin),
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
        |  length(replace(text, ' ', '')) AS n_word_chars,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ),

    // --- quality scoring ---------------------------------------------------
    "text_quality" -> QueryDef(
      (s, d) => sq(s, d,
        """SELECT doc_id, n_chars,
          |  size(split(text, ' ')) AS n_tokens,
          |  CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) / size(split(text, ' ')) AS distinct_ratio,
          |  CAST(size(filter(split(text, ' '), t -> t = 'the' OR t = 'a')) AS DOUBLE) / size(split(text, ' ')) AS stopword_ratio,
          |  (size(split(text, ' ')) BETWEEN 10 AND 120)
          |    AND (CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) / size(split(text, ' ')) > 0.2) AS is_quality
          |FROM documents
          |ORDER BY doc_id""".stripMargin),
      """SELECT doc_id, n_chars,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS distinct_ratio,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
        |  (len(string_split(text, ' ')) BETWEEN 10 AND 120)
        |    AND (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) > 0.2) AS is_quality
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ),

    // --- language ID: marker-token scoring with deterministic argmax -------
    "text_langid" -> QueryDef(
      (s, d) => sq(s, d,
        """WITH scored AS (
          |  SELECT doc_id, lang,
          |    size(filter(split(text, ' '), t -> t = 'the' OR t = 'a')) AS h_en,
          |    size(filter(split(text, ' '), t -> t = 'table' OR t = 'join')) AS h_de,
          |    size(filter(split(text, ' '), t -> t = 'data' OR t = 'query')) AS h_es,
          |    size(filter(split(text, ' '), t -> t = 'window' OR t = 'sort')) AS h_fr
          |  FROM documents)
          |SELECT doc_id, lang AS labeled_lang, h_en, h_de, h_es, h_fr,
          |  CASE
          |    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
          |    WHEN h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
          |    WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
          |    WHEN h_fr > 0 THEN 'fr'
          |    ELSE 'und' END AS detected_lang
          |FROM scored
          |ORDER BY doc_id""".stripMargin),
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS h_en,
        |    len(list_filter(string_split(text, ' '), t -> t = 'table' OR t = 'join')) AS h_de,
        |    len(list_filter(string_split(text, ' '), t -> t = 'data' OR t = 'query')) AS h_es,
        |    len(list_filter(string_split(text, ' '), t -> t = 'window' OR t = 'sort')) AS h_fr
        |  FROM documents)
        |SELECT doc_id, lang AS labeled_lang, h_en, h_de, h_es, h_fr,
        |  CASE
        |    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de > 0 THEN 'de'
        |    WHEN h_en >= h_es AND h_en >= h_fr AND h_en > 0 THEN 'en'
        |    WHEN h_es >= h_fr AND h_es > 0 THEN 'es'
        |    WHEN h_fr > 0 THEN 'fr'
        |    ELSE 'und' END AS detected_lang
        |FROM scored
        |ORDER BY doc_id""".stripMargin
    ),

    // --- document fingerprinting: hash of sorted distinct token set --------
    "text_fingerprint" -> QueryDef(
      (s, d) => sq(s, d,
        """SELECT md5(concat_ws(' ', array_sort(array_distinct(split(text, ' '))))) AS fingerprint,
          |  MIN(doc_id) AS keeper_doc_id, COUNT(1) AS n_docs
          |FROM documents
          |GROUP BY 1
          |ORDER BY fingerprint""".stripMargin),
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint,
        |  MIN(doc_id) AS keeper_doc_id, COUNT(1) AS n_docs
        |FROM documents
        |GROUP BY 1
        |ORDER BY fingerprint""".stripMargin
    ),

    // --- blocked exact n-gram Jaccard near-dup ------------------------------
    "dedup_ngram_jaccard" -> QueryDef(
      (s, d) => sq(s, d, blockedJaccardSql(sparkShinglesBlocked)),
      blockedJaccardSql(duckShinglesBlocked)
    ),

    // --- MinHash + LSH banding near-dup -------------------------------------
    "dedup_minhash_lsh" -> QueryDef(
      (s, d) => sq(s, d, minhashSql(sparkShingles)),
      minhashSql(duckShingles)
    )
  )

  def queries: Map[String, QueryDef] = qs
}
