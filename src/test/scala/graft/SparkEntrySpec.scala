package graft

import org.apache.spark.sql.functions._

/** Smoke + invariants for every declared query at sf0.001. The value-level
  * oracle compare runs driver-side (DuckDB); scripts/check_oracle.py mirrors
  * it locally at sf0.01.
  */
class SparkEntrySpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has matching oracle or is declared rows-only") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without query impl: ${os.diff(qs)}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      // executes fully; most queries should be non-empty at sf0.001 but
      // near-dup detectors may legitimately find nothing at tiny scale.
      df.count()
    }
  }

  test("q1 aggregates are consistent with direct recompute") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
    val row = df.filter(col("l_returnflag") === "A").limit(1).collect()
    assert(row.nonEmpty)
    val r = row.head
    val cnt = r.getAs[Long]("count_order")
    val sumQty = r.getAs[Double]("sum_qty")
    val avgQty = r.getAs[Double]("avg_qty")
    assert(math.abs(avgQty - sumQty / cnt) < 1e-9)
  }

  test("knn ranks are dense per query id") {
    val df = SparkEntry.queries("embed_knn_brute")(spark, sfDir)
    val ranks = df.groupBy("query_id").agg(collect_list("rank").as("rs")).collect()
    ranks.foreach { r =>
      val rs = r.getAs[scala.collection.Seq[Int]]("rs").toList.sorted
      assert(rs == (1 to rs.size).toList)
    }
  }
}
