package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** End-to-end check of the `hudi_stream_latest` oracle entry's harness
  * (AvailableNow trigger + pinned state-store count): the streaming path
  * must still reduce to the merged table state, and the session's
  * shuffle-partition conf must be restored after the stream clones it.
  */
class StreamLatestEntrySpec extends SparkTestBase {

  test("hudi_stream_latest entry drains with AvailableNow and restores conf") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val rows = SparkEntry.queries("hudi_stream_latest")(spark, sfDir).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "session shuffle.partitions must be restored after stream start")
    assert(rows.nonEmpty)
    // matches the oracle's closed form: deletes (key % 97 == 0) absent,
    // updates (key % 7 == 0) carry status 'U' and the T2 commit ordinal
    val byKey = rows.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byKey.keys.forall(_ % 97 != 0))
    val (upd, unch) = byKey.partition(_._1 % 7 == 0)
    assert(upd.nonEmpty && upd.values.forall(_._1 == "U"))
    assert(unch.nonEmpty && unch.values.forall(v => v._1 == "O" || v._1 == "F" || v._1 == "P"))
    assert(upd.values.map(_._2).toSet.size == 1 && unch.values.map(_._2).toSet.size == 1,
      "updated vs unchanged rows must carry the two distinct commit ordinals")
  }
}
