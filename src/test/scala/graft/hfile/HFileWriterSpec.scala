package graft.hfile

import org.scalatest.funsuite.AnyFunSuite

/** Round-trips [[HFileWriter]] output through [[HFileReader]] — the same
  * reader that parses the reference's real MDT HFiles — so the writer
  * stays within the v3 subset both readers accept.
  */
class HFileWriterSpec extends AnyFunSuite {

  private def rec(k: String, v: String): (String, Array[Byte]) = (k, v.getBytes("UTF-8"))

  test("round-trip: records, order, file info, multi-block index") {
    val records = (0 until 37).map(i => rec(f"key$i%03d", s"value-$i"))
    val bytes = HFileWriter.write(records,
      Map("schema" -> "{\"fake\":1}".getBytes("UTF-8")), recordsPerBlock = 5)
    val r = new HFileReader(bytes)
    assert(r.numEntries == 37)
    assert(r.trailer.numDataIndexLevels == 1)
    assert(r.dataIndex.size == 8) // ceil(37/5)
    assert(r.avroSchemaJson.contains("{\"fake\":1}"))
    val back = r.records.toVector
    assert(back.map(_.key) == records.map(_._1))
    assert(back.map(b => new String(b.value, "UTF-8")) == records.map(p => new String(p._2, "UTF-8")))
  }

  test("point lookups and prefix scans hit the right blocks") {
    val records = Seq("alpha", "beta", "beta2", "delta", "gamma").map(k => rec(k, s"v-$k"))
    val r = new HFileReader(HFileWriter.write(records, Map.empty, recordsPerBlock = 2))
    val found = r.lookup(Seq("beta", "gamma", "nope"))
    assert(found.keySet == Set("beta", "gamma"))
    assert(new String(found("beta").value, "UTF-8") == "v-beta")
    assert(r.recordsByPrefix("beta").map(_.key) == Vector("beta", "beta2"))
    assert(r.recordsByPrefix("zz").isEmpty)
  }

  test("unsorted input is rejected") {
    intercept[IllegalArgumentException] {
      HFileWriter.write(Seq(rec("b", "1"), rec("a", "2")), Map.empty)
    }
  }

  test("empty values survive (metadata-table tombstone shape)") {
    val r = new HFileReader(HFileWriter.write(
      Seq(("gone", Array.emptyByteArray), rec("here", "x")), Map.empty))
    val back = r.records.toVector
    assert(back.head.isDeleted && back.head.key == "gone")
    assert(!back(1).isDeleted)
  }
}
