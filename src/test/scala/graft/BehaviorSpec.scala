package graft

import org.apache.spark.sql.functions._

import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  test("funnelSteps: strictly-after ordering, non-increasing counts") {
    // u1 completes the full funnel; u2 clicks BEFORE viewing (click
    // doesn't count) and again at the same instant as the view (still
    // doesn't: strictly after); u3 views only.
    val df = Seq(
      ("u1", 10L, "view"), ("u1", 20L, "click"), ("u1", 30L, "purchase"),
      ("u2", 5L, "click"), ("u2", 10L, "view"), ("u2", 10L, "click"),
      ("u3", 1L, "view"),
      ("u4", 9L, "purchase") // never views: counts nowhere
    ).toDF("u", "ts", "s")
    val got = Behavior.funnelSteps(df, col("u"), col("ts"), col("s"),
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
  }

  test("transitions: per-user consecutive pairs, row-normalized") {
    // u1: a→b→a; u2: a→b. Transitions: a→b ×2, b→a ×1.
    // Row a: p(b|a)=1.0; row b: p(a|b)=1.0.
    val df = Seq(("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"),
      ("u2", 5L, "a"), ("u2", 6L, "b")).toDF("u", "ts", "s")
    val got = Behavior.transitions(df, col("u"), col("ts"), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    assert(got == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transitions: same-instant events order by step name") {
    // ts tie at 5: (b, c) ordered b then c → a→b, b→c
    val df = Seq(("u", 1L, "a"), ("u", 5L, "c"), ("u", 5L, "b"))
      .toDF("u", "ts", "s")
    val got = Behavior.transitions(df, col("u"), col("ts"), col("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq(("a", "b"), ("b", "c")))
  }

  test("cohortRetention: offset 0 is cohort size, returns counted once") {
    // bucket=10: u1 first in bucket 0, active again in buckets 1 and 3
    // (twice in 3 — counted once); u2 first in bucket 1.
    val df = Seq(("u1", 2L), ("u1", 15L), ("u1", 31L), ("u1", 35L),
      ("u2", 12L)).toDF("u", "ts")
    val got = Behavior.cohortRetention(df, col("u"), col("ts"), bucket = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == Seq((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L)))
  }

  test("attributionLinear: equal split over in-window touches, golden") {
    // u1: touches at t=10,20 (both in window of conv at 25, lookback 20
    //  → window [5,25]), conv value 6.0 → 3.0 each.
    //  A second conv at 31 (window [11,31]) sees only t=20 → 4.0 to it.
    // u2: touch at 100 AFTER conv at 50 → no attribution.
    // Touch exactly at conv time (u3, t=7) IS in-window (inclusive).
    val df = Seq(
      (1L, "u1", 10L, "click", 0.0),
      (2L, "u1", 20L, "view", 0.0),
      (3L, "u1", 25L, "purchase", 6.0),
      (4L, "u1", 31L, "purchase", 4.0),
      (5L, "u2", 100L, "click", 0.0),
      (6L, "u2", 50L, "purchase", 9.0),
      (7L, "u3", 7L, "click", 0.0),
      (8L, "u3", 7L, "purchase", 2.0)
    ).toDF("eid", "u", "ts", "ty", "v")
    val got = Behavior.attributionLinear(df, col("u"), col("ts"),
        col("ty"), col("v"), col("eid"),
        convType = "purchase", touchTypes = Seq("click", "view"),
        lookback = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 3.0), (2L, 2L, 7.0), (7L, 1L, 2.0)))
  }
}
