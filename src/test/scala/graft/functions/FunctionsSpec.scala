package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSession

/** Native expression semantics + the SparkSessionExtensions injection. */
class FunctionsSpec extends SparkTestBase {

  test("graft_dot matches the higher-order formulation") {
    LongArrayDot.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |  aggregate(zip_with(array(1L,2L,3L), array(4L,5L,6L), (x,y) -> x*y),
        |            CAST(0 AS BIGINT), (a,v) -> a+v) AS ref""".stripMargin).collect().head
    assert(r.getLong(0) == 32L && r.getLong(0) == r.getLong(1))
  }

  test("graft_dot null array yields null; mismatched lengths use min") {
    LongArrayDot.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS a, graft_dot(array(2L,9L), array(3L)) AS b")
      .collect().head
    assert(r.isNullAt(0) && r.getLong(1) == 6L)
  }

  test("graft_shingles matches the transform/array_distinct formulation") {
    ShingleSet.register(spark)
    val r = spark.sql(
      """SELECT sort_array(graft_shingles('hello world', 5)) AS a,
        |  sort_array(array_distinct(transform(
        |    sequence(1, greatest(length('hello world') - 4, 1)),
        |    i -> substring('hello world', i, 5)))) AS b""".stripMargin).collect().head
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }

  test("graft_shingles short-string lower bound") {
    ShingleSet.register(spark)
    val r = spark.sql("SELECT graft_shingles('abc', 5) AS s").collect().head
    assert(r.getSeq[String](0) == Seq("abc"))
  }

  test("SparkSessionExtensions wiring applies cleanly") {
    // the shared test session precludes building a second one with its own
    // extensions in-JVM; apply the injection directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions()
    new GraftExtensions().apply(ext)
  }

  test("graft_intersect_count equals size(array_intersect) on sorted sets") {
    SortedIntersectCount.register(spark)
    val rows = spark.sql(
      """SELECT graft_intersect_count(array_sort(a), array_sort(b)) AS fast,
        |       size(array_intersect(a, b)) AS slow
        |FROM VALUES
        |  (array('a','b','c'), array('b','c','d')),
        |  (array('x'), array('y')),
        |  (array('k'), array('k')),
        |  (CAST(array() AS ARRAY<STRING>), array('a')),
        |  (array('a','b','c','d','e'), array('e','a','c'))
        |AS t(a, b)""".stripMargin).collect()
    assert(rows.forall(r => r.getInt(0) == r.getInt(1)))
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 0, 1, 0, 3))
  }
}
