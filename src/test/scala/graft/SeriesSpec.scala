package graft

import org.apache.spark.sql.functions._

import graft.operators.Series

/** Goldens from /root/reference/test/cumsum_test.jl and
  * stencil_test1.jl (fixture data per FIXTURES.md). `numPartitions > 1`
  * forces the cross-partition offset/halo paths.
  */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  test("cumsum of ones(5) → [1,2,3,4,5], total 15 (cumsum_test.jl:6-13)") {
    val df = (1 to 5).map(i => (i.toLong, 1.0)).toDF("idx", "v")
    val got = Series.cumsum(df, col("idx"), col("v").cast("decimal(18,2)"),
        "cs", numPartitions = 3)
      .orderBy("idx").select(col("cs").cast("double")).collect()
      .map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(got.sum == 15.0)
  }

  test("cumsum multi-partition equals single-partition") {
    val df = (1 to 97).map(i => (i.toLong, (i % 7) + 0.25)).toDF("idx", "v")
    def run(n: Int) = Series.cumsum(df, col("idx"),
        col("v").cast("decimal(18,2)"), "cs", numPartitions = n)
      .orderBy("idx").select(col("cs").cast("double")).collect()
      .map(_.getDouble(0)).toSeq
    assert(run(8) == run(1))
  }

  test("globalRowNumbers: contiguous 0-based ids in order, partition-invariant") {
    val df = Seq(30L, 10L, 50L, 20L, 40L).toDF("k")
    def run(n: Int) = Series.globalRowNumbers(df, col("k"), "rid",
        numPartitions = n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = Map(10L -> 0L, 20L -> 1L, 30L -> 2L, 40L -> 3L, 50L -> 4L)
    assert(run(1) == expect && run(4) == expect)
  }

  test("stencil golden [1.2,2.125,2.875,2.85,1.9] (stencil_test1.jl:33)") {
    val df = Seq((1L, 1.2), (2L, 2.1), (3L, 3.1), (4L, 3.2), (5L, 1.9))
      .toDF("idx", "v")
    val got = Series.stencil3(df, col("idx"), col("v"), "out",
        numPartitions = 3)(
        (l, v, r) => (l + lit(2.0) * v + r) / lit(4.0))
      .orderBy("idx").select("out").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.2, 2.125, 2.875, 2.85, 1.9))
  }

  test("stencil multi-partition equals single-partition (halo exchange)") {
    val df = (1 to 53).map(i => (i.toLong, i * 0.5 % 9)).toDF("idx", "v")
    def run(n: Int) = Series.stencil3(df, col("idx"), col("v"), "out",
        numPartitions = n)((l, v, r) => (l + lit(2.0) * v + r) / lit(4.0))
      .orderBy("idx").select("out").collect().map(_.getDouble(0)).toSeq
    assert(run(7) == run(1))
  }

  test("radius-2 stencil golden: interior = 5-tap average, borders copy") {
    // values 1..7; taps 1,1,1,1,1 /5 → interior rows are plain means
    val df = (1 to 7).map(i => (i.toLong, i.toDouble)).toDF("idx", "v")
    val got = Series.stencil(df, col("idx"), col("v"), "out",
        radius = 2, numPartitions = 3)(
        xs => xs.reduce(_ + _) / lit(5.0))
      .orderBy("idx").select("out").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0))
  }

  test("radius-2 stencil is asymmetric-safe (no tap reordering)") {
    val df = (1 to 9).map(i => (i.toLong, i * i * 0.5)).toDF("idx", "v")
    def run(n: Int) = Series.stencil(df, col("idx"), col("v"), "out",
        radius = 2, numPartitions = n)(
        xs => xs(0) - lit(2.0) * xs(1) + xs(2) * xs(3) - xs(4))
      .orderBy("idx").select("out").collect().map(_.getDouble(0)).toSeq
    assert(run(4) == run(1))
  }

  test("radius-r stencil: halo spans multiple partitions smaller than r") {
    // 25 rows over 12 partitions → ~2 rows per partition < radius 5;
    // the prev/next halos must stitch values from several partitions.
    val df = (1 to 25).map(i => (i.toLong, (i % 11) + 0.5)).toDF("idx", "v")
    def run(n: Int) = Series.stencil(df, col("idx"), col("v"), "out",
        radius = 5, numPartitions = n)(
        xs => xs.reduce(_ + _) / lit(11.0))
      .orderBy("idx").select("out").collect().map(_.getDouble(0)).toSeq
    assert(run(12) == run(1))
  }

  test("asofJoin: latest right row at or before each left time, per key") {
    import spark.implicits._
    val left = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 30L),
      (103L, 3L, 30L)).toDF("event_id", "user_id", "us")
    val right = Seq((200L, 1L, 5L), (201L, 1L, 50L), (202L, 1L, 60L),
      (203L, 2L, 30L), (204L, 2L, 30L)).toDF("event_id", "user_id", "us")
    val out = Series.asofJoin(left, right, "user_id", "us", Seq("event_id"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    // inclusive ≤: equal timestamps match; ties pick the larger id
    assert(out(100L) == (Some(50L), Some(201L)))
    assert(out(101L) == (Some(5L), Some(200L)))
    assert(out(102L) == (Some(30L), Some(204L)))
    // no right row for key 3 → nulls (left-asof)
    assert(out(103L) == (None, None))
  }

  test("rangeJoin finds each in-window pair exactly once, incl. bucket edges") {
    import spark.implicits._
    // delta=10; pairs straddle bucket boundaries on purpose
    val left = Seq((1L, 1L, 100L), (2L, 1L, 9L), (3L, 2L, 50L))
      .toDF("lid", "user_id", "t")
    val right = Seq((10L, 1L, 110L), (11L, 1L, 91L), (12L, 1L, 111L),
      (13L, 1L, 19L), (14L, 2L, 300L)).toDF("rid", "user_id", "t")
    val got = Series.rangeJoin(left, right, "user_id", "t", 10L,
      payload = Seq("rid"))
      .select("lid", "r_rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    // lid=1 t=100 matches rids at 110 (edge, ≤) and 91; 111 is out
    assert(got == Seq((1L, 10L), (1L, 11L), (2L, 13L)))
  }

  test("resampleLocf fills gaps forward, keeps latest-in-bucket") {
    import spark.implicits._
    // step=10: user 1 observes in buckets 0 (two obs — bucket value is
    // the later, t=7), 1, and 4; buckets 2–3 are gaps that must carry
    // bucket 1's value. user 2 has a single bucket (grid of one).
    val df = Seq(
      (1L, 3L, 1.0), (1L, 7L, 2.0),     // bucket 0 → 2.0 (t=7 wins)
      (1L, 12L, 5.0),                    // bucket 1 → 5.0
      (1L, 45L, 9.0),                    // bucket 4 → 9.0
      (2L, 21L, 4.0)                     // bucket 2 only
    ).toDF("user_id", "t", "v")
    val got = Series.resampleLocf(df, "user_id", "t", "v", step = 10L,
        out = "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(got == Seq(
      (1L, 0L, 2.0), (1L, 10L, 5.0), (1L, 20L, 5.0), (1L, 30L, 5.0),
      (1L, 40L, 9.0), (2L, 20L, 4.0)))
  }

  test("resampleInterp: exact at observations, linear between, no extrapolation") {
    import spark.implicits._
    // step=10, key 1 observes (5, 10.0), (25, 50.0), (30, 20.0):
    // grid 10 → 10 + 40*(5/20) = 20; grid 20 → 10 + 40*(15/20) = 40;
    // grid 30 coincides with the obs → 20 exactly. No grid < 5 or > 30.
    // key 2's span [12, 18] contains no grid multiple → no rows.
    val df = Seq((1L, 5L, 10.0), (1L, 25L, 50.0), (1L, 30L, 20.0),
      (2L, 12L, 7.0), (2L, 18L, 9.0)).toDF("k", "t", "v")
    val got = Series.resampleInterp(df, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq
    assert(got == Seq((1L, 10L, 20.0), (1L, 20L, 40.0), (1L, 30L, 20.0)))
  }

  test("resampleInterp collapses same-time duplicates to max") {
    import spark.implicits._
    val df = Seq((1L, 10L, 3.0), (1L, 10L, 9.0), (1L, 30L, 9.0))
      .toDF("k", "t", "v")
    val got = Series.resampleInterp(df, "k", "t", "v", step = 10L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(got == Seq((10L, 9.0), (20L, 9.0), (30L, 9.0)))
  }

  test("rollingRange trails by time, ties are frame peers") {
    import spark.implicits._
    // lookback=10: at t=15 the frame is [5,15]; the two t=20 rows are
    // RANGE peers — each sees both (frame [10,20])
    val df = Seq((1L, 5L, 1.0), (1L, 15L, 2.0), (1L, 20L, 4.0),
      (1L, 20L, 8.0), (1L, 40L, 16.0), (2L, 15L, 32.0))
      .toDF("k", "t", "v")
    val got = Series.rollingRange(df, "k", "t", "v", lookback = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sorted.toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 1.0), (1L, 15L, 2L, 3.0),
      (1L, 20L, 3L, 14.0), (1L, 20L, 3L, 14.0),
      (1L, 40L, 1L, 16.0), (2L, 15L, 1L, 32.0)))
  }

  test("resampleLocf ties on time break by value, deterministically") {
    import spark.implicits._
    val df = Seq((1L, 5L, 3.0), (1L, 5L, 8.0)).toDF("user_id", "t", "v")
    val got = Series.resampleLocf(df, "user_id", "t", "v", step = 10L)
      .collect().map(r => r.getDouble(2)).toSeq
    assert(got == Seq(8.0))
  }
}
