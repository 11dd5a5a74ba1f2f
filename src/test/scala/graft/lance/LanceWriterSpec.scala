package graft.lance

import graft.SparkTestBase
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

/** Round-trips every LanceWriter type through LanceFormat — the reader
  * side is independently pinned on the reference's golden bytes
  * (LanceFormatSpec), so agreement here proves the writer emits the same
  * subset rather than a private dialect.
  */
class LanceWriterSpec extends SparkTestBase {

  test("all supported types round-trip") {
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("d", DoubleType),
      StructField("b", BooleanType), StructField("dt", DateType),
      StructField("ts", TimestampType), StructField("dec", DecimalType(15, 2))))
    val rows: Seq[Seq[Any]] = (0 until 11).map { k =>
      Seq(s"row-$k" * (k % 3 + 1), k, k.toLong * 1000000007L, k / 8.0,
        k % 3 == 0, 19000 + k, 1700000000000000L + k,
        new java.math.BigDecimal(s"${k * 111}.4$k"))
    }
    val path = java.nio.file.Files.createTempDirectory("lancew").resolve("t.lance").toString
    LanceWriter.write(path, conf, schema, rows)

    assert(LanceFormat.rowCount(path, conf) == 11L)
    assert(LanceFormat.readSchema(path, conf).map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = LanceFormat.rows(path, conf, schema).toArray
    assert(got.length == 11)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getUTF8String(0).toString == s"row-$k" * (k % 3 + 1))
      assert(r.getInt(1) == k)
      assert(r.getLong(2) == k.toLong * 1000000007L)
      assert(r.getDouble(3) == k / 8.0)
      assert(r.getBoolean(4) == (k % 3 == 0))
      assert(r.getInt(5) == 19000 + k)
      assert(r.getLong(6) == 1700000000000000L + k)
      assert(r.getDecimal(7, 15, 2).toJavaBigDecimal ==
        new java.math.BigDecimal(s"${k * 111}.4$k").setScale(2))
    }
    // negative decimals exercise the sign-extension path
    val negSchema = StructType(Seq(StructField("dec", DecimalType(10, 2))))
    val negPath = java.nio.file.Files.createTempDirectory("lancew").resolve("n.lance").toString
    LanceWriter.write(negPath, conf, negSchema,
      Seq(Seq(new java.math.BigDecimal("-12345.67")), Seq(new java.math.BigDecimal("-0.01"))))
    val neg = LanceFormat.rows(negPath, conf, negSchema).toArray
    assert(neg(0).getDecimal(0, 10, 2).toJavaBigDecimal == new java.math.BigDecimal("-12345.67"))
    assert(neg(1).getDecimal(0, 10, 2).toJavaBigDecimal == new java.math.BigDecimal("-0.01"))
  }

  test("multi-page files concat correctly (per-page string offsets restart)") {
    // production Lance files page at ~8 MB; force 7-row pages over 23 rows
    // so string pages have NON-ALIGNED boundaries and per-page offset
    // buffers restart at zero — the reader must stitch pages seamlessly
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("l", LongType),
      StructField("b", BooleanType)))
    val rows: Seq[Seq[Any]] = (0 until 23).map(k =>
      Seq("x" * (k % 5) + s"#$k", k.toLong, k % 2 == 0))
    val path = java.nio.file.Files.createTempDirectory("lancemp").resolve("mp.lance").toString
    LanceWriter.write(path, conf, schema, rows, pageRows = 7)
    val lf = LanceFormat.readMetadata(path, conf)
    assert(lf.columns.head.pages.length == 4, "23 rows at 7/page = 4 pages")
    assert(LanceFormat.rowCount(path, conf) == 23L)
    val got = LanceFormat.rows(path, conf, schema).toArray
    assert(got.length == 23)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getUTF8String(0).toString == "x" * (k % 5) + s"#$k", s"row $k")
      assert(r.getLong(1) == k.toLong)
      assert(r.getBoolean(2) == (k % 2 == 0))
    }
  }

  test("MISALIGNED per-column pages stitch correctly (real files page by bytes)") {
    // production Lance pages each column at ~8 MB of BYTES, so columns
    // of different widths have different rows-per-page — the fixtures'
    // uniform paging never exercises this. Page three columns at 5/7/3
    // rows over 23 rows (none aligned with another or with the 4096-row
    // batch chunking) and assert both read paths stitch identically.
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType),
      StructField("b", BooleanType)))
    val rows: Seq[Seq[Any]] = (0 until 23).map(k =>
      Seq(k, if (k % 4 == 0) null else "v" * (k % 5) + s"#$k", k % 3 == 0))
    val path = java.nio.file.Files.createTempDirectory("lancemis").resolve("m.lance").toString
    LanceWriter.write(path, conf, schema, rows, pageRows = 5,
      pageRowsByCol = Map("s" -> 7, "b" -> 3))
    val lf = LanceFormat.readMetadata(path, conf)
    assert(lf.topLevel.map(_.pages.length) == Seq(5, 4, 8),
      "23 rows at 5/7/3 rows per page")
    val got = LanceFormat.rows(path, conf, schema).toArray
    assert(got.length == 23)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getInt(0) == k)
      assert(r.isNullAt(1) == (k % 4 == 0), s"s row $k")
      if (k % 4 != 0) assert(r.getUTF8String(1).toString == "v" * (k % 5) + s"#$k")
      assert(r.getBoolean(2) == (k % 3 == 0))
    }
    // columnar path over the same misaligned pages, small batches so a
    // batch spans page boundaries of every column at once
    val batches = LanceFormat.batches(path, conf, schema, batchRows = 4).toArray
    assert(batches.map(_.numRows()).sum == 23)
    val flat = batches.flatMap(b => (0 until b.numRows()).map { i =>
      (b.column(0).getInt(i),
        if (b.column(1).isNullAt(i)) null else b.column(1).getUTF8String(i).toString,
        b.column(2).getBoolean(i))
    })
    flat.zipWithIndex.foreach { case ((i, sv, bv), k) =>
      assert(i == k && bv == (k % 3 == 0))
      assert((sv == null) == (k % 4 == 0))
      if (k % 4 != 0) assert(sv == "v" * (k % 5) + s"#$k")
    }
  }

  test("nullable pages round-trip: some_nulls bitmaps across page boundaries") {
    // nulls scattered over every type, with 3-row pages so null patterns
    // cross page boundaries; one page (rows 3-5 of "oi") is ALL null,
    // exercising the bufferless all_nulls branch mid-column
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("os", StringType), StructField("oi", IntegerType),
      StructField("ol", LongType), StructField("od", DoubleType),
      StructField("ob", BooleanType), StructField("odt", DateType),
      StructField("ots", TimestampType), StructField("odec", DecimalType(12, 3))))
    def v(k: Int, m: Int, value: Any): Any = if (k % m == 0) null else value
    val rows: Seq[Seq[Any]] = (0 until 14).map { k =>
      Seq(
        v(k, 3, s"str-$k"),
        if (k >= 3 && k <= 5) null else k, // page 2 of oi all-null
        v(k, 4, k.toLong * 37L),
        v(k, 5, k / 16.0),
        v(k, 2, k % 3 == 0),
        v(k, 6, 20000 + k),
        v(k, 7, 1700000000000000L + k),
        v(k, 3, new java.math.BigDecimal(s"-$k.25${k % 10}")))
    }
    val path = java.nio.file.Files.createTempDirectory("lancenul").resolve("n.lance").toString
    LanceWriter.write(path, conf, schema, rows, pageRows = 3)

    assert(LanceFormat.rowCount(path, conf) == 14L)
    val got = LanceFormat.rows(path, conf, schema).toArray
    assert(got.length == 14)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.isNullAt(0) == (k % 3 == 0), s"os row $k")
      if (k % 3 != 0) assert(r.getUTF8String(0).toString == s"str-$k")
      assert(r.isNullAt(1) == (k >= 3 && k <= 5), s"oi row $k")
      if (!(k >= 3 && k <= 5)) assert(r.getInt(1) == k)
      assert(r.isNullAt(2) == (k % 4 == 0), s"ol row $k")
      if (k % 4 != 0) assert(r.getLong(2) == k.toLong * 37L)
      assert(r.isNullAt(3) == (k % 5 == 0), s"od row $k")
      if (k % 5 != 0) assert(r.getDouble(3) == k / 16.0)
      assert(r.isNullAt(4) == (k % 2 == 0), s"ob row $k")
      if (k % 2 != 0) assert(r.getBoolean(4) == (k % 3 == 0))
      assert(r.isNullAt(5) == (k % 6 == 0), s"odt row $k")
      if (k % 6 != 0) assert(r.getInt(5) == 20000 + k)
      assert(r.isNullAt(6) == (k % 7 == 0), s"ots row $k")
      if (k % 7 != 0) assert(r.getLong(6) == 1700000000000000L + k)
      assert(r.isNullAt(7) == (k % 3 == 0), s"odec row $k")
      if (k % 3 != 0)
        assert(r.getDecimal(7, 12, 3).toJavaBigDecimal ==
          new java.math.BigDecimal(s"-$k.25${k % 10}").setScale(3))
    }

    // exact null counts from metadata + validity bitmaps only
    val lf = LanceFormat.readMetadata(path, conf)
    def nulls(name: String): Long = {
      val (len, col) = (new java.io.File(path).length,
        lf.topLevel.find(_.field.name == name).get)
      val in = new java.io.RandomAccessFile(path, "r")
      try LanceFormat.columnNullCount(col, (pos, n) => {
        val b = new Array[Byte](n); in.seek(pos); in.readFully(b); b
      }) finally in.close()
    }
    assert(nulls("os") == 5)   // k % 3 == 0 in 0..13
    assert(nulls("oi") == 3)   // rows 3..5
    assert(nulls("ol") == 4)   // k % 4 == 0
    assert(nulls("ob") == 7)   // k % 2 == 0
  }

  test("list columns round-trip: float32 embeddings across page boundaries") {
    // the ML-embedding shape Lance exists for: list<float> vectors of
    // varying length, 5-row pages over 13 rows so parent offset buffers
    // restart at zero per page while the child elements page independently
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("tags", ArrayType(StringType, containsNull = false))))
    val rows: Seq[Seq[Any]] = (0 until 13).map { k =>
      Seq(k.toLong,
        (0 until (k % 4 + 2)).map(i => (k * 10 + i) / 7.0f),
        (0 until (k % 3)).map(i => s"tag-$k-$i"))
    }
    val path = java.nio.file.Files.createTempDirectory("lancelist").resolve("l.lance").toString
    LanceWriter.write(path, conf, schema, rows, pageRows = 5)

    val lf = LanceFormat.readMetadata(path, conf)
    assert(lf.columns.length == 5, "2 list fields expand to offsets+child columns")
    assert(lf.topLevel.map(_.field.name) == Seq("vec_id", "embedding", "tags"))
    val st = LanceFormat.readSchema(path, conf)
    assert(st("embedding").dataType == ArrayType(FloatType, containsNull = false))
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))

    val got = LanceFormat.rows(path, conf, schema).toArray
    assert(got.length == 13)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getLong(0) == k.toLong)
      val emb = r.getArray(1).toFloatArray().toSeq
      assert(emb == (0 until (k % 4 + 2)).map(i => (k * 10 + i) / 7.0f), s"embedding row $k")
      val tags = r.getArray(2).toSeq[org.apache.spark.unsafe.types.UTF8String](StringType)
        .map(_.toString)
      assert(tags == (0 until (k % 3)).map(i => s"tag-$k-$i"), s"tags row $k")
    }
  }

  test("NULLABLE list rows round-trip: some_nulls offsets pages (r13)") {
    // null embedding rows (a corpus row with no vector yet) across page
    // boundaries: the some_nulls wrapper over list offsets, null rows as
    // zero-width offset slots; one page (rows 10-14) is ALL null to also
    // drive the bufferless all_nulls list branch; empty-but-valid lists
    // must stay distinguishable from null rows
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    def expected(k: Int): Option[Seq[Float]] =
      if (k >= 10 && k < 15) None // the all-null page
      else if (k % 4 == 1) None // scattered nulls inside mixed pages
      else if (k % 7 == 3) Some(Seq.empty[Float]) // EMPTY list, not null
      else Some((0 until (k % 3 + 1)).map(i => (k * 10 + i) / 7.0f))
    val rows: Seq[Seq[Any]] = (0 until 18).map(k => Seq(k.toLong, expected(k).orNull))
    val path = java.nio.file.Files.createTempDirectory("lancenulllist").resolve("n.lance").toString
    LanceWriter.write(path, conf, schema, rows, pageRows = 5)

    val lf = LanceFormat.readMetadata(path, conf)
    val emb = lf.topLevel.find(_.field.name == "embedding").get
    assert(emb.pages.exists(_.encoding.isInstanceOf[LanceFormat.SomeNulls]),
      "mixed pages must use the some_nulls wrapper")
    assert(emb.pages.exists(_.encoding == LanceFormat.AllNullPage),
      "the all-null page must be bufferless all_nulls")

    val got = LanceFormat.rows(path, conf, schema).toArray
    assert(got.length == 18)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getLong(0) == k.toLong)
      expected(k) match {
        case None => assert(r.isNullAt(1), s"row $k must be a NULL list")
        case Some(e) =>
          assert(!r.isNullAt(1), s"row $k must not be null")
          assert(r.getArray(1).toFloatArray().toSeq == e, s"row $k elements")
      }
    }
  }

  test("an entirely-null column round-trips as all_nulls pages") {
    val conf = new Configuration()
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("gone", StringType)))
    val rows: Seq[Seq[Any]] = (0 until 9).map(k => Seq(k, null))
    val path = java.nio.file.Files.createTempDirectory("lanceall").resolve("a.lance").toString
    LanceWriter.write(path, conf, schema, rows, pageRows = 4)
    val lf = LanceFormat.readMetadata(path, conf)
    val gone = lf.topLevel.find(_.field.name == "gone").get
    assert(gone.pages.length == 3 && gone.pages.forall(_.bufOffsets.isEmpty),
      "all_nulls pages carry no buffers")
    val got = LanceFormat.rows(path, conf, schema).toArray
    assert(got.length == 9)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getInt(0) == k && r.isNullAt(1))
    }
  }

  test("lance scans go columnar (incl. the r13 MOR merge); lists keep the row path") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
      df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head

    // atomic-typed COW snapshot: vectorized batches
    val cow = spark.read.format("hudi-graft")
      .load(graft.fixtures.HudiFixtureBuilder.lancePath(sfDir))
      .select("n_nationkey", "n_name", "score")
    assert(scanOf(cow).supportsColumnar, "log-free atomic lance scan must be columnar")
    val rows = cow.orderBy("n_nationkey").collect()
    assert(rows.length == 25 && rows.map(_.getDouble(2)).toSeq ==
      (0 until 25).map(_ / 4.0), "columnar decode must match the proven values")

    // nullable columns ride the columnar path too (putNull per slot)
    val nul = spark.read.format("hudi-graft")
      .load(graft.fixtures.HudiFixtureBuilder.lanceNullsPath(sfDir))
      .select("n_nationkey", "comment_opt", "weight")
    assert(scanOf(nul).supportsColumnar)
    val nrows = nul.orderBy("n_nationkey").collect()
    assert(nrows.count(_.isNullAt(1)) == 9 && nrows.count(_.isNullAt(2)) == 6)

    // a projected LIST column is outside the batch builder: row path
    val emb = spark.read.format("hudi-graft")
      .load(graft.fixtures.HudiFixtureBuilder.lanceEmbedPath(sfDir))
      .select("vec_id", "embedding")
    assert(!scanOf(emb).supportsColumnar, "list projection must fall back to rows")
    // ... but pruning the list away restores vectorization
    val embIds = spark.read.format("hudi-graft")
      .load(graft.fixtures.HudiFixtureBuilder.lanceEmbedPath(sfDir))
      .select("vec_id", "label")
    assert(scanOf(embIds).supportsColumnar, "list-free projection is columnar")

    // MOR with logs (r13): the merge itself goes COLUMNAR — the base
    // rides LanceFormat.batches through GraftColumnarMergeReader (the
    // parquet columnar-merge machinery), content-pinned by the
    // row-vs-columnar differential in DataSourceV2Spec
    val mor = spark.read.format("hudi-graft")
      .load(graft.fixtures.HudiFixtureBuilder.morLancePath(sfDir))
      .select("n_nationkey", "n_name")
    assert(scanOf(mor).supportsColumnar, "merged MOR lance scan merges in batch-land (r13)")

    // LIMIT terminates the stream early — the chunk iterator is not
    // drained, so the task-completion close path covers the open file
    val lim = spark.read.format("hudi-graft")
      .load(graft.fixtures.HudiFixtureBuilder.lancePath(sfDir))
      .select("n_nationkey", "n_name").limit(3).collect()
    assert(lim.length == 3)
  }

  test("the hudi-graft STREAM serves Lance MOR tables (S7 x S4)") {
    // readStream over a Lance-based MOR table: the micro-batch machinery
    // plans the same slices and the per-slice merge rides the Lance
    // reader — one AvailableNow batch is the merged incremental state
    // (deletes applied), which must equal the batch snapshot exactly
    import org.apache.spark.sql.functions._
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val p = graft.fixtures.HudiFixtureBuilder.morLancePath(sfDir)
    val sink = "graft_lance_stream_sink"
    spark.catalog.dropTempView(sink)
    val q = spark.readStream.format("hudi-graft").load(p)
      .select("n_nationkey", "n_name", "score")
      .writeStream.outputMode("append").format("memory")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .queryName(sink).start()
    try q.awaitTermination() finally q.stop()
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    val streamed = flat(spark.table(sink))
    val snap = flat(spark.read.format("hudi-graft").load(p)
      .select("n_nationkey", "n_name", "score"))
    assert(streamed == snap && streamed.nonEmpty,
      s"stream-only=${(streamed -- snap).take(3)} snap-only=${(snap -- streamed).take(3)}")
    // the merge really ran: '-v2' updates present, %7=3 deletes absent
    assert(streamed.exists(_._2.endsWith("-v2")))
    assert(!streamed.exists(_._1 % 7 == 3))
  }

  test("the built lance fixture table reads through the full engine") {
    graft.fixtures.HudiFixtureBuilder.ensure(spark, sfDir)
    val t = graft.table.HudiTable(spark, graft.fixtures.HudiFixtureBuilder.lancePath(sfDir))
    assert(t.isLance)
    val rows = t.snapshot().select("n_nationkey", "n_name", "score").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == 25)
    rows.foreach { case (k, nm, sc) =>
      assert(sc == k / 4.0)
      assert(nm.endsWith("-v2") == (k % 5 == 0), s"key $k name $nm")
    }
    // time travel to T1: no -v2 anywhere
    val t1 = t.snapshot(asOf = Some(graft.fixtures.HudiFixtureBuilder.T1))
      .select("n_name").collect().map(_.getString(0))
    assert(t1.length == 25 && !t1.exists(_.endsWith("-v2")))
  }
}
