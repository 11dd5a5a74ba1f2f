package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time arbitrary sub-phases of the heavy dedup queries to
  * attribute steady-state cost. Not part of the driver contract.
  */
object DevPhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    graft.functions.ShingleSet.register(spark)
    graft.functions.SortedIntersectCount.register(spark)
    graft.queries.Tables.documents(spark, sfDir).createOrReplaceTempView("documents")

    // warm the session
    t("warmup docs count")(spark.table("documents").count())

    // --- simhash phases ---
    val run = sys.env.getOrElse("DEV_PHASES", "simhash")
    if (run.contains("simhash")) {
      // sigs aggregation alone, uncached
      val sigsSql =
        """WITH toks AS (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents),
          |sigs0 AS (SELECT doc_id,
          |  CASE WHEN SUM(CASE WHEN substring(md5(tok), 1, 1) >= '8' THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS bit0
          |  FROM toks GROUP BY doc_id)
          |SELECT * FROM sigs0""".stripMargin
      t("simhash 1-bit agg (uncached)")(spark.sql(sigsSql).count())
      t("dedup_simhash cold")(SparkEntry.queries("dedup_simhash")(spark, sfDir).count())
      t("dedup_simhash warm1")(SparkEntry.queries("dedup_simhash")(spark, sfDir).count())
      val sigs = spark.table("simhash_sigs")
      println("[phase] isCached(simhash_sigs)=" + spark.catalog.isCached("simhash_sigs"))
      println("[phase] plan uses InMemory: " +
        sigs.queryExecution.executedPlan.toString.contains("InMemory"))
      t("sigs cached count")(sigs.count())
      t("sigs cached count 2")(sigs.count())
      t("sigs cached count 3")(spark.table("simhash_sigs").count())
      val full = SparkEntry.queries("dedup_simhash")(spark, sfDir)
      println("[phase] full query uses InMemory: " +
        full.queryExecution.executedPlan.toString.contains("InMemory"))
      t("dedup_simhash warm2")(full.count())
      import org.apache.spark.sql.functions._
      // DataFrame-API pairs over the SAME cached relation: no SQL view.
      def dfPairs(): org.apache.spark.sql.DataFrame = {
        val branches = (0 until 4).map { b =>
          sigs.as("a").join(sigs.as("b"),
            col(s"a.band$b") === col(s"b.band$b") && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              expr("bit_count(a.sig ^ b.sig)").as("hamming"))
            .filter(col("hamming") <= 2)
        }
        branches.reduce(_ union _).distinct()
          .select(col("doc_a"), col("doc_b"), col("hamming").cast("int"))
          .orderBy("doc_a", "doc_b")
      }
      t("df-api pairs cold")(println("[phase] df pairs=" + dfPairs().count()))
      t("df-api pairs warm")(dfPairs().count())
      val b0 = sigs.as("a").join(sigs.as("b"),
        org.apache.spark.sql.functions.col("a.band0") === org.apache.spark.sql.functions.col("b.band0") &&
        org.apache.spark.sql.functions.col("a.doc_id") < org.apache.spark.sql.functions.col("b.doc_id"))
      t("one band join count")(b0.count())
      t("dedup_simhash warm2")(SparkEntry.queries("dedup_simhash")(spark, sfDir).count())
    }
    if (run.contains("ngram")) {
      t("dedup_ngram cold")(SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
      t("dedup_ngram warm")(SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir).count())
      import org.apache.spark.sql.functions._
      // rebuild the same candidate phases over fresh (uncached) relations
      // to attribute warm cost: shingle explode, self-join fan-out,
      // distinct, verify
      val docsets = spark.sql(
        "SELECT doc_id, lang, source, array_sort(graft_shingles(text, 5)) AS shset FROM documents")
      val shingles = docsets.selectExpr("doc_id", "lang", "source", "explode(shset) AS shingle")
      t("shingles count")(println("[phase] shingles=" + shingles.count()))
      val key = Seq("lang", "source", "shingle")
      val hot = shingles.groupBy(key.map(col): _*).count()
        .filter(col("count") > 64).drop("count")
      val rare = shingles.join(broadcast(hot), key, "left_anti").persist()
      t("rare count")(println("[phase] rare=" + rare.count()))
      val rh = rare.hint("shuffle_hash")
      val candRaw = rh.as("sa").join(rh.as("sb"),
        col("sa.lang") === col("sb.lang") && col("sa.source") === col("sb.source") &&
          col("sa.shingle") === col("sb.shingle") && col("sa.doc_id") < col("sb.doc_id"))
        .select(col("sa.doc_id").as("doc_a"), col("sb.doc_id").as("doc_b"))
      t("cand raw count")(println("[phase] candRaw=" + candRaw.count()))
      val cand = candRaw.distinct()
      t("cand distinct count")(println("[phase] cand=" + cand.count()))
      t("cand distinct again")(cand.count())
    }
    if (run.contains("minhash")) {
      t("dedup_minhash cold")(SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
      t("dedup_minhash warm")(SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
    }
    if (run.contains("stream")) {
      t("hudi_stream_latest cold")(SparkEntry.queries("hudi_stream_latest")(spark, sfDir).count())
      t("hudi_stream_latest warm")(SparkEntry.queries("hudi_stream_latest")(spark, sfDir).count())
    }
    spark.stop()
  }
}
