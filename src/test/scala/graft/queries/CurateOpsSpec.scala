package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window

/** Semantics + plan-shape checks for the curation operators (CurateOps).
  * Values are oracle-checked by the driver; these tests pin the
  * invariants the oracle can't see: contamination must cover exactly the
  * benchmark members and their injected copies, the train-prep splits
  * must partition the deduped survivors, the LM/KL scores must be
  * rerun-deterministic, and no plan may contain an un-partitioned window.
  */
class CurateOpsSpec extends SparkTestBase {

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  private def noGlobalWindows(d: DataFrame): Unit = {
    val global = d.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty,
      s"plan must not contain un-partitioned windows: ${global.map(_.windowExpressions)}")
  }

  test("decontaminate flags the benchmark members and their injected copies") {
    val rows = run("text_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // every benchmark doc (doc_id % 17 == 3 in the base range) shares all
    // of its own grams with the benchmark, so it must flag — unless it is
    // too short to have any 13-gram (then it trivially cannot overlap).
    // The dup-injection offset mirrors corpusSql: max(doc_id) + 1.
    val offset = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(org.apache.spark.sql.functions.max("doc_id")).collect()(0).getLong(0) + 1
    val bench = rows.keys.filter(k => k < offset && k % 17 == 3)
    assert(bench.nonEmpty)
    val nGrams = run("text_decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    bench.foreach { k =>
      assert(rows(k) || nGrams(k) == 0, s"benchmark doc $k must be contaminated")
    }
    // injected copies of benchmark members are verbatim contamination
    bench.filter(_ % 10 == 0).foreach { k =>
      rows.get(k + offset).foreach(flag =>
        assert(flag || nGrams(k) == 0, s"copy of benchmark doc $k must be contaminated"))
    }
  }

  test("train prep splits partition the deduped survivors") {
    val rows = run("pipeline_train_prep").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "valid"))
    val total = rows.map(_.getLong(1)).sum
    assert(total > 0 && total <= 1100, s"survivors must be a subset of the corpus, got $total")
    // digests must be distinct across splits (membership-sensitive)
    assert(rows.map(_.getLong(4)).distinct.length == 3)
  }

  test("lm bigram scores are rerun-deterministic and doc-window-bounded") {
    val d = run("text_lm_bigram")
    noGlobalWindows(d)
    val a = d.collect().map(_.toString).toSeq
    val b = run("text_lm_bigram").collect().map(_.toString).toSeq
    assert(a == b, "LM scores must be bit-identical across reruns")
    assert(a.nonEmpty)
  }

  test("source KL is rerun-deterministic and non-negative") {
    val rows = run("text_source_kl").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0,
        s"KL(source || corpus) must be non-negative, got ${r.getDouble(4)} for ${r.getString(0)}")
    }
    val again = run("text_source_kl").collect().map(_.toString).toSeq
    assert(again == rows.map(_.toString).toSeq)
  }
}
