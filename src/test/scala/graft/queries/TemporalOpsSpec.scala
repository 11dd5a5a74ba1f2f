package graft.queries

import graft.SparkTestBase
import java.sql.Timestamp

/** As-of edge cases the sf fixtures never hit (every sf0.01 event has a
  * prior order): no-prior-order NULL, inclusive equal-timestamp match,
  * and the max-orderkey tie-break among same-date orders.
  */
class TemporalOpsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof matches latest prior order, inclusively, with NULL when none") {
    import spark.implicits._
    val events = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")), // before any order -> NULL
      (2L, 7L, ts("2024-01-02 00:00:00")), // equal to order date -> inclusive match
      (3L, 7L, ts("2024-01-05 00:00:00")), // after both -> latest wins
      (4L, 9L, ts("2024-01-05 00:00:00"))  // user with no orders at all
    ).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (100L, 7L, ts("2024-01-02 00:00:00"), 10.0),
      (101L, 7L, ts("2024-01-02 00:00:00"), 20.0), // same date: max key wins
      (102L, 7L, ts("2024-01-04 00:00:00"), 30.0)
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    val got = TemporalOps.asof(events, orders)
      .collect().map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(3))))
    assert(got === Array(
      (1L, None, None),
      (2L, Some(101L), Some(20.0)),
      (3L, Some(102L), Some(30.0)),
      (4L, None, None)))
  }
}
