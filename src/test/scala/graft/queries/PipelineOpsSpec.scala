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
