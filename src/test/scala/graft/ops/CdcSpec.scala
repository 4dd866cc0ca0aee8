package graft.ops

import graft.SparkSpec

/** SCD2 history build and MERGE-style CDC apply (q67/q68). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_id, ts-nanos, event_type, value): user 1 runs
  // A,A,B,A; user 2 a single run; user 3's latest change is a tombstone
  private def evs = Seq(
    (1L, 10L, 1000000L, "A", 1.0),
    (1L, 11L, 2000000L, "A", 2.0),
    (1L, 12L, 3000000L, "B", 3.0),
    (1L, 13L, 4000000L, "A", 4.0),
    (2L, 20L, 1000000L, "C", 5.0),
    (3L, 30L, 1000000L, "A", 6.0),
    (3L, 31L, 2000000L, "error", 7.0)
  ).toDF("user_id", "event_id", "ts", "event_type", "value")

  test("scd2: runs collapse to versioned intervals, lead-closed") {
    val out = Cdc.scd2HistoryOf(evs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
      .toSeq
    assert(out == Seq(
      (1L, 1L, "A", 1000L, 3000L, 2L, false),
      (1L, 2L, "B", 3000L, 4000L, 1L, false),
      (1L, 3L, "A", 4000L, -1L, 1L, true),
      (2L, 1L, "C", 1000L, -1L, 1L, true),
      (3L, 1L, "A", 1000L, 2000L, 1L, false),
      (3L, 2L, "error", 2000L, -1L, 1L, true)))
  }

  test("scd2 invariants on the real corpus: intervals tile, counts sum") {
    val ev = Events.events(spark, "/root/testdata/sf0.001")
    val hist = Cdc.scd2HistoryOf(ev).collect()
    val perUser = hist.groupBy(_.getLong(0))
    val totals = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perUser.foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // exactly one open (current) version per user, and it is the last
      assert(sorted.count(_.getBoolean(6)) == 1 && sorted.last.getBoolean(6))
      // each closed interval's valid_to is the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) == b.getLong(3))
        case _ =>
      }
      // adjacent versions really changed type, and n_events covers all
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(2) != b.getString(2))
        case _ =>
      }
      assert(sorted.map(_.getLong(5)).sum == totals(uid))
    }
    assert(perUser.nonEmpty)
  }

  test("cdc apply: update, keep, insert, tombstone") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("key", "base_balance")
    // key 1 updated, key 2 untouched, key 3 tombstoned, key 4 inserted
    val changes = Seq(
      (1L, "view", 11.0), (3L, "error", 0.0), (4L, "click", 44.0)
    ).toDF("key", "change_type", "change_value")
    val out = Cdc.cdcApplyOf(base, changes).orderBy("key")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq
    assert(out == Seq(
      (1L, 11.0, "update"), (2L, 20.0, "keep"), (4L, 44.0, "insert")))
  }

  test("changelog compaction picks the latest (us, event_id) row per key") {
    val changes = Cdc.latestChanges(evs).orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(changes == Seq(
      (1L, "A", 4.0), (2L, "C", 5.0), (3L, "error", 7.0)))
  }
}
