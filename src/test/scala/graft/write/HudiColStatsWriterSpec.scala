package graft.write

import graft.SparkTestBase
import graft.table.{ColumnStatsIndex, HudiTable}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Writes against a column_stats table: the staging pass computes exact
  * per-(file, column) bounds, the MDT receives them as an HFile log
  * overlay BEFORE the data commit, and the index keeps pruning/answering
  * over connector-written files (new file names covered with tight
  * bounds and real null counts; uncovered types fall open).
  */
class HudiColStatsWriterSpec extends SparkTestBase {

  private def orders() = spark.read.parquet(s"$sfDir/orders.parquet")

  private def copyFixture(name: String): String = {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val fs = FileSystem.get(spark.sessionState.newHadoopConf())
    val dst = new Path(s"/root/repo/target/hudi-fixtures/$name")
    fs.delete(dst, true)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new Path(graft.fixtures.HudiFixtureBuilder.rangePath(sfDir)), fs, dst, false,
      spark.sessionState.newHadoopConf())
    dst.toString
  }

  test("upsert maintains column_stats: new files covered with exact tight bounds") {
    val path = copyFixture("writer_colstats")
    // %7 upsert rewrites groups -> NEW file names need fresh index entries
    orders().filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("X"))
      .write.format("hudi-graft")
      .option("hoodie.datasource.write.recordkey.field", "o_orderkey")
      .option("hoodie.datasource.write.precombine.field", "o_custkey")
      .mode(SaveMode.Append).save(path)

    val t = HudiTable(spark, path)
    val c2 = t.timeline.latestCommitTimestamp.get
    val newFiles = t.fsView.slicesAsOf(c2)
      .filter(_.commitTimestamp == c2).flatMap(_.baseFile)
    assert(newFiles.nonEmpty, "the upsert must have rewritten groups")

    val lookup = ColumnStatsIndex.load(path, spark.sessionState.newHadoopConf())
    val byFile = lookup.pruningStats
    newFiles.foreach { bf =>
      val stats = byFile.getOrElse(bf.fileName,
        fail(s"no column_stats entry for rewritten file ${bf.fileName}"))
      assert(stats.contains("o_orderkey"), stats.keySet.toString)
      // bounds are EXACT: recompute from the file itself
      val actual = spark.read.parquet(bf.path)
        .agg(min("o_orderkey"), max("o_orderkey")).head
      val (mn, mx) = stats("o_orderkey")
      assert(mn == actual.getLong(0) && mx == actual.getLong(1),
        s"${bf.fileName}: index ($mn,$mx) vs actual (${actual.getLong(0)},${actual.getLong(1)})")
      // tight + counted: the aggregate tiers can ANSWER from these
      assert(lookup.tightStats.get(bf.fileName).exists(_.contains("o_orderkey")))
      assert(lookup.rowCounts.contains(bf.fileName))
    }

    // the key-range pruned read stays correct over the mixed old/new index
    val q = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderkey") <= 100)
      .select("o_orderkey", "o_orderstatus")
    val expect = orders().filter(col("o_orderkey") <= 100)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet == expect)

    // COUNT(*) over the updated table agrees (index-count tier or footer
    // tier — either way the maintained counts must not corrupt it)
    assert(spark.read.format("hudi-graft").load(path).count() == orders().count())
  }
}
