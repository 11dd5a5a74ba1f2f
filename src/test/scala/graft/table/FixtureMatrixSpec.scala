package graft.table

import graft.SparkTestBase

/** Systematic snapshot parity against the reference's golden SampleTable
  * matrix (crates/test/src/lib.rs:256-285; expectations from
  * crates/core/tests/table_read_tests.rs): every published v6/v8 variant —
  * keygen (simple/complex/none) × hive-style × url-encoding × metafields ×
  * COW/MOR — must read to the same canonical rows. This covers classes the
  * targeted specs don't: MOR tables whose logs carry PARQUET data blocks,
  * no-metafields MOR, v8 cow keygen variants, and the MOR rollback /
  * overwrite tables.
  */
class FixtureMatrixSpec extends SparkTestBase {

  private type Rows = Set[(Int, String, Boolean)]
  private val canonical: Rows =
    Set((1, "Alice", false), (2, "Bob", false), (3, "Carol", true), (4, "Diana", true))
  // updated→rolled back→re-updated per the fixture's .sql script
  private val rollback: Rows = Set((1, "Alice", true), (2, "Bob", true), (3, "Carol", true))
  // insert_overwrite_table replaces the whole table with one row
  private val overwritten: Rows = Set((4, "Diana", false))
  private val empty: Rows = Set.empty

  private case class Fx(zip: String, name: String, dest: String, expected: Rows)
  private def cow(n: String, exp: Rows) =
    Fx(s"sample_table/cow/$n.zip", n, s"matrix_cow_$n", exp)
  private def morPq(n: String, exp: Rows) =
    Fx(s"sample_table/mor/parquet/$n.zip", n, s"matrix_morpq_$n", exp)

  private val matrix = Seq(
    // --- COW v6: keygen × hive-style × metafields ------------------------
    cow("v6_simplekeygen_nonhivestyle", canonical),
    cow("v6_complexkeygen_hivestyle", canonical),
    cow("v6_nonpartitioned", canonical),
    cow("v6_simplekeygen_hivestyle_no_metafields", canonical),
    cow("v6_timebasedkeygen_nonhivestyle", canonical),
    cow("v6_simplekeygen_nonhivestyle_overwritetable", overwritten),
    cow("v6_empty", empty),
    // --- COW v8 (completion-time timeline, 8.x layout) -------------------
    cow("v8_nonpartitioned", canonical),
    cow("v8_simplekeygen_nonhivestyle", canonical),
    cow("v8_complexkeygen_hivestyle", canonical),
    cow("v8_simplekeygen_hivestyle_no_metafields", canonical),
    cow("v8_empty", empty),
    // --- MOR v6 with PARQUET log blocks ----------------------------------
    morPq("v6_nonpartitioned", canonical),
    morPq("v6_simplekeygen_nonhivestyle", canonical),
    morPq("v6_complexkeygen_hivestyle", canonical),
    morPq("v6_simplekeygen_hivestyle_no_metafields", canonical),
    morPq("v6_simplekeygen_nonhivestyle_overwritetable", overwritten),
    morPq("v6_nonpartitioned_rollback", rollback),
    morPq("v6_empty", empty)
  )

  for (fx <- matrix) {
    test(s"matrix snapshot: ${fx.dest.stripPrefix("matrix_")}") {
      val path = Fixtures.table(fx.zip, fx.name, fx.dest)
      assume(path.isDefined, s"fixture ${fx.zip} unavailable")
      val df = HudiTable(spark, path.get).snapshot()
      val rows: Rows = df.select("id", "name", "isActive")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet
      assert(rows == fx.expected, s"${fx.zip}: got $rows")
    }
  }

  test("matrix: nested values survive the parquet log-block merge") {
    // id 1's latest version arrives via a PARQUET log block; its struct /
    // array / decimal columns must decode to the same values the COW
    // variant's base file carries (HudiTableSpec asserts the same triple)
    val path = Fixtures.table("sample_table/mor/parquet/v6_simplekeygen_nonhivestyle.zip",
      "v6_simplekeygen_nonhivestyle", "matrix_morpq_v6_simplekeygen_nonhivestyle")
    assume(path.isDefined)
    import org.apache.spark.sql.functions._
    val r = HudiTable(spark, path.get).snapshot().filter(col("id") === 1)
      .select(col("structField.field1"),
        element_at(col("arrayField"), 1).getField("arr_struct_f1"),
        col("decimalField").cast("string"))
      .collect().head
    assert(r.getString(0) == "Alice" && r.getString(1) == "red" && r.getString(2) == "12345.67890")
  }
}
