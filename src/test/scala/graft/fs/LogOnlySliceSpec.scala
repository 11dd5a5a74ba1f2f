package graft.fs

import org.scalatest.funsuite.AnyFunSuite

/** Slice assembly for base-less (log-only) file groups — the pre-first-
  * compaction MOR shape the reference's mod.rs:195 TODO drops. Pure
  * in-memory assembly checks; end-to-end reads are oracle-checked
  * (`hudi_mor_log_only`, `hudi_dsv2_log_only`) and covered by
  * HudiTableSpec's fixture tests.
  */
class LogOnlySliceSpec extends AnyFunSuite {

  private def base(fileId: String, ts: String) =
    BaseFile(fileId, "tok", ts, None, "parquet", s"/t/$fileId-$ts.parquet", 10L)
  private def log(fileId: String, ts: String, v: Int, completion: Option[String] = None) =
    LogFile(fileId, ts, completion, "log", v, "tok", s"/t/.$fileId-$ts.$v", 5L)

  test("logs without any base file form a base-less slice at the first log instant") {
    val groups = FileGroup.assemble("p", Nil,
      Seq(log("f1", "002", 1), log("f1", "002", 2)))
    assert(groups.size == 1)
    val g = groups.head
    assert(g.slices.size == 1)
    val slice = g.slices("002")
    assert(slice.baseFile.isEmpty)
    assert(slice.fileId == "f1" && slice.commitTimestamp == "002")
    assert(slice.logFiles.map(_.version) == Vector(1, 2))
    // invisible before its creating instant, visible at/after it
    assert(g.sliceAsOf("001").isEmpty)
    assert(g.sliceAsOf("002").contains(slice))
  }

  test("a later compaction base starts a fresh slice; pre-base logs stay on the log-only slice") {
    val groups = FileGroup.assemble("p",
      Seq(base("f1", "005")),
      Seq(log("f1", "002", 1), log("f1", "002", 2), log("f1", "005", 1)))
    val g = groups.head
    assert(g.slices.keySet == Set("002", "005"))
    val logOnly = g.slices("002")
    assert(logOnly.baseFile.isEmpty && logOnly.logFiles.map(_.version) == Vector(1, 2))
    val compacted = g.slices("005")
    assert(compacted.baseFile.isDefined && compacted.logFiles.map(_.timestamp) == Vector("005"))
    // time travel before compaction reads the log-only slice
    assert(g.sliceAsOf("004").contains(logOnly))
    assert(g.sliceAsOf("005").contains(compacted))
  }

  test("v8 completion timestamps anchor logs onto the log-only slice") {
    // log written at request 003 completing at 004 joins the group created
    // at 002 (largest slice key <= completion), not a new slice
    val groups = FileGroup.assemble("p", Nil,
      Seq(log("f1", "002", 1, completion = Some("002")),
        log("f1", "003", 1, completion = Some("004"))))
    val g = groups.head
    assert(g.slices.keySet == Set("002"))
    assert(g.slices("002").logFiles.map(_.timestamp) == Vector("002", "003"))
  }

  test("mixed partition: base-only, mixed, and log-only groups coexist") {
    val groups = FileGroup.assemble("p",
      Seq(base("a", "001"), base("b", "001")),
      Seq(log("b", "001", 1), log("c", "002", 1)))
    assert(groups.map(_.fileId) == Vector("a", "b", "c"))
    assert(groups(0).slices("001").baseFile.isDefined && !groups(0).slices("001").hasLogFiles)
    assert(groups(1).slices("001").baseFile.isDefined && groups(1).slices("001").hasLogFiles)
    assert(groups(2).slices("002").baseFile.isEmpty && groups(2).slices("002").hasLogFiles)
    // read-optimized semantics: stripping logs leaves nothing to read for c
    val ro = groups.flatMap(_.sliceAsOf("002")).map(_.withoutLogs).filter(_.baseFile.isDefined)
    assert(ro.map(_.fileId) == Vector("a", "b"))
  }
}
