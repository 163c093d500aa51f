package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics on hand-built frames: latest-prior match,
  * inclusive equal-time match, inner drop without a prior right row,
  * and per-key isolation. */
class AsOfJoinSpec extends AnyFunSuite {
  private def spark = SparkTestSession.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left time, per key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l_a"), // after r1, before r2
      (1L, ts("2024-01-01 12:00:00"), "l_b"), // exactly at r2 → inclusive
      (1L, ts("2024-01-01 08:00:00"), "l_c"), // before any right → dropped
      (2L, ts("2024-01-01 10:00:00"), "l_d")  // other key: r3 only
    ).toDF("k", "lt", "l_tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "r1"),
      (1L, ts("2024-01-01 12:00:00"), "r2"),
      (2L, ts("2024-01-01 09:30:00"), "r3")
    ).toDF("k", "rt", "r_tag")

    val out = AsOfJoin.asofJoin(left, right, "k", "lt", "rt")
      .orderBy("k", "lt")
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, "l_a", "r1"),
      (1L, "l_b", "r2"),
      (2L, "l_d", "r3")))
  }

  test("asofJoin returns the matched row's NULLs — no stitching from older rows") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "l")).toDF("k", "lt", "l_tag")
    // the matched (latest prior) right row has a NULL payload; the older
    // row's non-null payload must NOT leak into the output (DuckDB ASOF
    // returns the matched row as-is, NULL fields included)
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Option("old_payload")),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[String])
    ).toDF("k", "rt", "r_payload")

    val out = AsOfJoin.asofJoin(left, right, "k", "lt", "rt").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getTimestamp(r.fieldIndex("rt")) == ts("2024-01-01 11:00:00"))
    assert(r.isNullAt(r.fieldIndex("r_payload")))
  }

  test("asofJoinTolerance drops matches older than the bound, keeps in-bound ones") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "fresh"),  // r at 09:30 → 30 min old
      (1L, ts("2024-01-01 18:00:00"), "stale")   // latest r 09:30 → 8.5 h old
    ).toDF("k", "lt", "l_tag")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), "r1")).toDF("k", "rt", "r_tag")

    val out = AsOfJoin.asofJoinTolerance(left, right, "k", "lt", "rt", 3600L)
      .collect().map(r => r.getString(r.fieldIndex("l_tag")))
    assert(out.toSeq == Seq("fresh")) // the stale match drops (inner)
    // boundary is inclusive: exactly tolerance-old still matches
    val boundary = AsOfJoin.asofJoinTolerance(
      Seq((1L, ts("2024-01-01 10:30:00"), "edge")).toDF("k", "lt", "l_tag"),
      right, "k", "lt", "rt", 3600L).count()
    assert(boundary == 1L)
    // and the internal match-time column does not leak into the output
    assert(!AsOfJoin.asofJoinTolerance(left, right, "k", "lt", "rt", 3600L)
      .columns.contains("_matched_t"))
  }

  test("asofJoin plan is one window, no join node") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "lt", "lv")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 2.0)).toDF("k", "rt", "rv")
    val plan = AsOfJoin.asofJoin(left, right, "k", "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("Join"))
  }
}
