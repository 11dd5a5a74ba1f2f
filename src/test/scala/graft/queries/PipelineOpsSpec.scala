package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the second-wave pipeline operators
  * (PipelineOps). Values are oracle-checked by the driver; these tests pin
  * the properties the oracle can't see — the scale-critical plan shapes
  * (windows must be stratum-partitioned, never global) and the invariants
  * that make the operators meaningful (splits partition the corpus, PII
  * counts track the injection rule).
  */
class PipelineOpsSpec extends SparkTestBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  private def partitionedWindowsOnly(d: DataFrame): Unit = {
    val global = d.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"plan must not contain un-partitioned windows, found: ${global.map(_.windowExpressions)}")
  }

  test("text_repetition fractions are well-formed and bounded") {
    val rows = run("text_repetition").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val top = r.getAs[Double]("top_token_frac")
      val dup = r.getAs[Double]("dup_token_frac")
      assert(n >= 10)
      assert(top >= 1.0 / n && top <= 1.0)
      assert(dup >= 0.0 && dup <= 1.0)
      // every duplicated token contributes at least its own count ≥ the mode
      assert(dup == 0.0 || dup >= top)
      val topB = r.getAs[Double]("top_bigram_frac")
      val dupB = r.getAs[Double]("dup_bigram_frac")
      assert(topB > 0.0 && topB <= 1.0 && dupB >= 0.0 && dupB <= 1.0)
    }
  }

  test("text_pii counts follow the deterministic injection rule") {
    val rows = run("text_pii").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_emails") === (if (id % 7 == 0) 1 else 0), s"doc $id emails")
      assert(r.getAs[Int]("n_ips") === (if (id % 11 == 0) 1 else 0), s"doc $id ips")
      assert(r.getAs[Int]("n_phones") === (if (id % 13 == 0) 1 else 0), s"doc $id phones")
      assert(r.getAs[String]("redacted_hash").length === 32)
    }
  }

  test("sample_split partitions the corpus into three stable buckets") {
    val rows = run("sample_split").collect()
    assert(rows.map(_.getAs[String]("split")).sorted.toSeq === Seq("test", "train", "valid"))
    val counts = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(counts.values.sum === 500L)
    // expectation: 12/16, 2/16, 2/16 of 500 — allow generous hash variance
    assert(counts("train") > 300 && counts("train") < 450)
    assert(counts("valid") > 20 && counts("test") > 20)
    // determinism: a second run hashes identically
    val again = run("sample_split").collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("members_hash")).toMap
    rows.foreach(r =>
      assert(again(r.getAs[String]("split")) === r.getAs[Long]("members_hash")))
  }

  test("sample_stratified takes exactly k per stratum with a partitioned window") {
    val d = run("sample_stratified")
    partitionedWindowsOnly(d)
    val rows = d.collect()
    assert(rows.length === 5) // en de es fr zh
    rows.foreach(r => assert(r.getAs[Long]("n_sampled") === 20L,
      s"stratum ${r.getAs[String]("lang")}"))
  }

  test("text_tfidf yields top-3 terms per doc, scores non-increasing") {
    val d = run("text_tfidf")
    partitionedWindowsOnly(d)
    val rows = d.collect()
    assert(rows.length === 1500) // 3 per doc
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val byRk = rs.sortBy(_.getAs[Int]("rk").toLong)
      assert(byRk.map(_.getAs[Int]("rk").toLong).toSeq === Seq(1L, 2L, 3L), s"doc $id ranks")
      val scores = byRk.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores === scores.sorted.reverse, s"doc $id scores not descending")
    }
  }

  test("text_chunk_windows tiles every document with stride-24 windows") {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = run("text_chunk_windows").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet == docs.keySet)
    for ((id, cs) <- chunks) {
      val n = docs(id)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_id"))
      // chunk ids dense from 0; count = one window plus a stride step per
      // uncovered 24-token remainder past the first 32
      assert(sorted.map(_.getAs[Int]("chunk_id")).toSeq == sorted.indices)
      assert(sorted.length == (math.max(n - 32, 0) + 23) / 24 + 1)
      // all chunks full-size except possibly the last, which covers the tail
      sorted.init.foreach(c => assert(c.getAs[Int]("n_tokens") == 32))
      val last = sorted.last
      assert((sorted.length - 1) * 24 + last.getAs[Int]("n_tokens") == n)
      // token content round-trips: each chunk has n_tokens words
      sorted.foreach { c =>
        assert(c.getAs[String]("chunk_text").split(" ").length == c.getAs[Int]("n_tokens"))
      }
    }
  }

  test("pipeline_pack_sequences places docs contiguously within each shard") {
    val rows = run("pipeline_pack_sequences").collect()
    assert(rows.length === 500)
    // the running placement never leaves a gap: within a bucket, sorting by
    // (seq_id, seq_offset) recovers a contiguous token stream
    rows.groupBy(_.getAs[Int]("bucket")).foreach { case (_, rs) =>
      val placed = rs.map(r => (r.getAs[Int]("seq_id").toLong * 512 + r.getAs[Int]("seq_offset"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1)
      placed.foldLeft(0L) { case (expectedStart, (start, n)) =>
        assert(start == expectedStart, s"gap in packed stream at $start")
        start + n
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Int]("seq_offset") >= 0 && r.getAs[Int]("seq_offset") < 512)
      assert(r.getAs[Int]("bucket") >= 0 && r.getAs[Int]("bucket") < 256)
    }
    // packing windows are shard-partitioned, never global
    partitionedWindowsOnly(run("pipeline_pack_sequences"))
  }

  test("embed_label_outliers scores every vector against its label centroid") {
    val rows = run("embed_label_outliers").collect()
    assert(rows.length === Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val s = r.getAs[Double]("outlier_score")
      assert(s >= 0.0 && s <= 2.0, s"cosine distance out of range: $s")
    }
    // scores are emitted ordered within each label (top outliers first)
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, rs) =>
      val scores = rs.map(_.getAs[Double]("outlier_score")).toSeq
      assert(scores == scores.sorted(Ordering[Double].reverse))
    }
  }

  test("q_rollup grand total row matches the table count") {
    val rows = run("q_rollup").collect()
    val total = rows.filter(r => r.getAs[Int]("g_flag") == 1 && r.getAs[Int]("g_status") == 1)
    assert(total.length === 1)
    val liCount = Tables.lineitem(spark, sfDir).count()
    assert(total.head.getAs[Long]("n_rows") === liCount)
    // subtotal rows sum to the grand total
    val flagSubtotals = rows.filter(r => r.getAs[Int]("g_flag") == 0 && r.getAs[Int]("g_status") == 1)
    assert(flagSubtotals.map(_.getAs[Long]("n_rows")).sum === liCount)
  }
}
