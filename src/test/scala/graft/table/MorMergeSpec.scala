package graft.table

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Merge edge semantics, mirroring the reference's RecordMerger unit tests
  * (record_merger.rs:192-462) and ordering rules (ordering.rs:41-51):
  * null-ordering loses, commit-seqno tiebreak, delete event/commit
  * comparison and the integer-zero special case.
  */
class MorMergeSpec extends SparkTestBase {

  private val dataSchema = StructType(Seq(
    StructField("_hoodie_commit_time", StringType),
    StructField("_hoodie_commit_seqno", StringType),
    StructField("_hoodie_record_key", StringType),
    StructField("_hoodie_partition_path", StringType),
    StructField("ord", LongType),
    StructField("val", StringType)))

  private val deleteSchema = StructType(Seq(
    StructField("_hoodie_commit_time", StringType),
    StructField("_hoodie_record_key", StringType),
    StructField("_hoodie_partition_path", StringType),
    StructField("ord", LongType)))

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), dataSchema)

  private def dels(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), deleteSchema)

  private def values(result: org.apache.spark.sql.DataFrame): Map[String, String] =
    result.collect().map(r => r.getAs[String]("_hoodie_record_key") -> r.getAs[String]("val")).toMap

  test("latest ordering wins; seqno breaks ties") {
    val data = df(
      Row("001", "001_1", "k1", "p", 5L, "old"),
      Row("002", "002_1", "k1", "p", 9L, "new"),
      Row("001", "001_2", "k2", "p", 5L, "a"),
      Row("002", "002_2", "k2", "p", 5L, "b")) // equal ord → seqno desc
    val out = values(MorMerge.merge(data, None, Some("ord"), "OVERWRITE_WITH_LATEST"))
    assert(out == Map("k1" -> "new", "k2" -> "b"))
  }

  test("null ordering in newer version loses to older non-null") {
    val data = df(
      Row("001", "001_1", "k1", "p", 5L, "keep"),
      Row("002", "002_1", "k1", "p", null, "null-ord"))
    val out = values(MorMerge.merge(data, None, Some("ord"), "OVERWRITE_WITH_LATEST"))
    assert(out == Map("k1" -> "keep"))
  }

  test("delete wins on greater event time, loses on smaller") {
    val data = df(
      Row("001", "001_1", "k1", "p", 5L, "x"),
      Row("001", "001_2", "k2", "p", 5L, "y"))
    val d = dels(
      Row("002", "k1", "p", 9L), // greater event time → delete
      Row("002", "k2", "p", 3L)) // smaller → record survives
    val out = values(MorMerge.merge(data, Some(d), Some("ord"), "OVERWRITE_WITH_LATEST"))
    assert(out == Map("k2" -> "y"))
  }

  test("equal event time: commit time breaks the tie") {
    val data = df(
      Row("005", "005_1", "k1", "p", 5L, "x"),
      Row("005", "005_2", "k2", "p", 5L, "y"))
    val d = dels(
      Row("009", "k1", "p", 5L), // same ord, later commit → delete
      Row("001", "k2", "p", 5L)) // same ord, earlier commit → survives
    val out = values(MorMerge.merge(data, Some(d), Some("ord"), "OVERWRITE_WITH_LATEST"))
    assert(out == Map("k2" -> "y"))
  }

  test("integer-zero delete ordering compares on commit time only") {
    val data = df(
      Row("005", "005_1", "k1", "p", 7L, "x"),
      Row("005", "005_2", "k2", "p", 7L, "y"))
    val d = dels(
      Row("009", "k1", "p", 0L), // zero ord, later commit → delete wins
      Row("001", "k2", "p", 0L)) // zero ord, earlier commit → survives
    val out = values(MorMerge.merge(data, Some(d), Some("ord"), "OVERWRITE_WITH_LATEST"))
    assert(out == Map("k2" -> "y"))
  }

  test("append-only keeps every version") {
    val data = df(
      Row("001", "001_1", "k1", "p", 5L, "a"),
      Row("002", "002_1", "k1", "p", 9L, "b"))
    assert(MorMerge.merge(data, None, Some("ord"), "APPEND_ONLY").count() == 2)
  }
}
