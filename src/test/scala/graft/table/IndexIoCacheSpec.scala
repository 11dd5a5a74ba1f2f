package graft.table

import graft.SparkTestBase
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Pins the planning-latency contract of [[IndexIoCache]]: a REPEAT
  * point query on an index-covered table performs ZERO index byte reads
  * (every MDT HFile/log fetch is served from the LRU), and the cache's
  * invalidation story is structural — new MDT commits materialize NEW
  * immutable paths, which miss and read fresh.
  */
class IndexIoCacheSpec extends SparkTestBase {

  test("repeat secondary-index point planning performs zero index byte reads") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    IndexIoCache.clear()
    def run() = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderstatus") === "P")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val first = run()
    val readsAfterFirst = IndexIoCache.reads.get()
    assert(readsAfterFirst > 0, "first plan must fetch index bytes (cache was cleared)")
    val hitsBefore = IndexIoCache.hits.get()
    val second = run()
    assert(IndexIoCache.reads.get() == readsAfterFirst,
      "second identical plan must perform zero index byte reads")
    assert(IndexIoCache.hits.get() > hitsBefore, "second plan must be served from the cache")
    assert(second.sameElements(first))
  }

  test("record-key point planning hits the cache on repeat too") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val path = graft.fixtures.HudiFixtureBuilder.sidxPath(sfDir)
    val k = spark.read.parquet(s"$sfDir/orders.parquet")
      .agg(org.apache.spark.sql.functions.min(col("o_orderkey"))).head.getLong(0)
    def run() = spark.read.format("hudi-graft").load(path)
      .filter(col("o_orderkey") === k).count()
    run() // warm (whatever was already cached)
    val before = IndexIoCache.reads.get()
    val n = run()
    assert(IndexIoCache.reads.get() == before,
      "repeat record-index point plan must not re-read MDT bytes")
    assert(n == 1)
  }

  test("repeat column_stats planning reuses the decoded lookup, not just the bytes") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val base = graft.fixtures.HudiFixtureBuilder.rangePath(sfDir)
    val conf = spark.sessionState.newHadoopConf()
    val first = ColumnStatsIndex.load(base, conf)
    val d = ColumnStatsIndex.decodes.get()
    val second = ColumnStatsIndex.load(base, conf)
    assert(ColumnStatsIndex.decodes.get() == d,
      "second load at the same MDT commit must not re-decode the partition")
    assert(second eq first, "memo must return the same decoded instance")
    // the memo rides on the plan path too: repeat R2-pruned planning
    // decodes nothing (each read builds a fresh HudiTable, whose lazy
    // lookup now resolves through the shared memo)
    def plan() = spark.read.format("hudi-graft").load(base)
      .filter(col("o_orderkey") <= 5L).queryExecution.executedPlan.toString()
    plan()
    val d2 = ColumnStatsIndex.decodes.get()
    plan()
    assert(ColumnStatsIndex.decodes.get() == d2,
      "repeat pruned planning must serve column stats from the decoded memo")
  }

  test("invalidation is structural: a new path misses, same path never re-reads") {
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("graft-ioc").toFile
    try {
      val a = new java.io.File(dir, "00000000_tok_20240101000000000.hfile")
      val b = new java.io.File(dir, "00000000_tok_20240102000000000.hfile")
      java.nio.file.Files.write(a.toPath, "aaaa".getBytes)
      java.nio.file.Files.write(b.toPath, "bbbb".getBytes)
      val r0 = IndexIoCache.reads.get()
      assert(new String(IndexIoCache.bytes(new Path(a.toString), conf)) == "aaaa")
      assert(IndexIoCache.reads.get() == r0 + 1)
      assert(new String(IndexIoCache.bytes(new Path(a.toString), conf)) == "aaaa")
      assert(IndexIoCache.reads.get() == r0 + 1, "same immutable path must not re-read")
      // a commit advance = a NEW file name: misses and reads exactly once
      assert(new String(IndexIoCache.bytes(new Path(b.toString), conf)) == "bbbb")
      assert(IndexIoCache.reads.get() == r0 + 2)
      // an IN-PLACE append (0.x MDT log writers append blocks across
      // deltacommits under the SAME path) must miss too — the key
      // carries (len, mtime), so pre-append bytes are never served
      java.nio.file.Files.write(a.toPath, "aaaaCCCC".getBytes)
      assert(new String(IndexIoCache.bytes(new Path(a.toString), conf)) == "aaaaCCCC",
        "appended file must re-read, not serve stale cached bytes")
      assert(IndexIoCache.reads.get() == r0 + 3)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("eviction keeps the cached byte total under the cap") {
    val conf = spark.sessionState.newHadoopConf()
    val dir = java.nio.file.Files.createTempDirectory("graft-ioc-evict").toFile
    sys.props("graft.index.io.cache.max.bytes") = "64"
    try {
      IndexIoCache.clear()
      for (i <- 0 until 8) {
        val f = new java.io.File(dir, s"f$i.hfile")
        java.nio.file.Files.write(f.toPath, Array.fill[Byte](32)(i.toByte))
        IndexIoCache.bytes(new Path(f.toString), conf)
        assert(IndexIoCache.cachedBytes <= 64,
          s"cache exceeded cap after $i: ${IndexIoCache.cachedBytes}")
      }
      // the LAST file is still resident (LRU evicts eldest first)
      val before = IndexIoCache.reads.get()
      IndexIoCache.bytes(new Path(new java.io.File(dir, "f7.hfile").toString), conf)
      assert(IndexIoCache.reads.get() == before)
    } finally {
      sys.props -= "graft.index.io.cache.max.bytes"
      IndexIoCache.clear()
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
