package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Sketch}

/** Table profiling and histograms: golden stats, single-aggregate-scan
  * plan shape, ndv consistency with the standalone sketch, histogram
  * clamping. */
class ProfileSpec extends SparkSpec {

  private def t = {
    import spark.implicits._
    Seq(
      (1L, Some("x"), 10L),
      (2L, None, 20L),
      (3L, Some("y"), 10L),
      (4L, Some("x"), 30L)
    ).toDF("id", "tag", "v")
  }

  test("tableProfile golden: counts, nulls, min/max, ndv") {
    val rows = Profile.tableProfile(t, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4),
          r.getAs[Double]("ndv_approx"))).toMap
    assert(rows("id")._1 == 4 && rows("id")._2 == 0)
    assert(rows("id")._3 == "1" && rows("id")._4 == "4")
    assert(rows("tag") == ((3L, 1L, "x", "y", rows("tag")._5)))
    assert(rows("v")._3 == "10" && rows("v")._4 == "30")
    // small-cardinality ndv estimates land near truth (HLL, m=64)
    assert(math.abs(rows("id")._5 - 4.0) < 2.0)
    assert(math.abs(rows("tag")._5 - 2.0) < 1.5)
    assert(math.abs(rows("v")._5 - 3.0) < 1.5)
  }

  test("tableProfile ndv equals the standalone sketch per column") {
    val prof = Profile.tableProfile(t, Seq("v"))
      .collect()(0).getAs[Double]("ndv_approx")
    val solo = Sketch.approxCountDistinct(
      t.filter(col("v").isNotNull), col("v"), "n", Seq.empty)
      .collect()(0).getAs[Double]("n")
    assert(prof == solo)
  }

  test("stats scan is one aggregate over the table (no per-column jobs)") {
    val plan = Profile.tableProfile(t, Seq("id", "tag", "v"))
      .queryExecution.optimizedPlan.toString
    // the stats side contributes exactly one scan-aggregate; the ndv
    // side one more — never one aggregate per profiled column
    val aggs = "(?m)^\\s*[+:]?-?\\s*Aggregate".r
      .findAllIn(plan).size
    assert(aggs <= 4, s"too many aggregates ($aggs):\n$plan")
  }

  test("histogram clamps out-of-range values to edge bins") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 100.0, 250.0)
      .toDF("x")
    val got = Profile.histogram(df, col("x"), 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got(0L) == ((0.0, 3L)))  // -5 (clamped), 0.0, 9.9
    assert(got(1L) == ((10.0, 1L))) // 10.0
    assert(got(5L) == ((50.0, 1L))) // 55
    assert(got(9L) == ((90.0, 3L))) // 99.9, 100 (right edge), 250 (clamp)
    assert(got.values.map(_._2).sum == 8L)
  }

  test("chiSquare: hand-computed 2x2, absent cells contribute e") {
    import spark.implicits._
    // 2x2: o = [[10,20],[20,10]]; all e = 15 → chi2 = 4·(25/15) = 20/3
    val rows = Seq.fill(10)(("x", 0L)) ++ Seq.fill(20)(("x", 1L)) ++
      Seq.fill(20)(("y", 0L)) ++ Seq.fill(10)(("y", 1L))
    val r = Profile.chiSquare(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(r.getLong(0) == 60 && r.getLong(1) == 1)
    assert(math.abs(r.getDouble(2) - 20.0 / 3.0) < 1e-6)
    // an absent cell ((y,1) never observed) still contributes e:
    // o = [[5,5],[10,0]]; row x=10, y=10, col0=15, col1=5, N=20
    // e = [[7.5,2.5],[7.5,2.5]]
    // chi2 = 2·(2.5²/7.5) + 2·(2.5²/2.5) = 5/6 + 5/6 + 2.5 + 2.5 = 20/3
    val rows2 = Seq.fill(5)(("x", 0L)) ++ Seq.fill(5)(("x", 1L)) ++
      Seq.fill(10)(("y", 0L))
    val r2 = Profile.chiSquare(rows2.toDF("a", "b"), col("a"), col("b"))
      .head()
    assert(r2.getLong(0) == 20 && r2.getLong(1) == 1)
    assert(math.abs(r2.getDouble(2) - 20.0 / 3.0) < 1e-6)
    // null categories are excluded (complete-case), not silently
    // corrupted through the unmatched-null-key grid join
    val withNulls = rows ++ Seq.fill(30)((null: String, 1L))
    val r3 = Profile.chiSquare(withNulls.toDF("a", "b"),
      col("a"), col("b")).head()
    assert(r3.getLong(0) == 60 && r3.getLong(1) == 1)
    assert(math.abs(r3.getDouble(2) - 20.0 / 3.0) < 1e-6)
  }

  test("dqRowChecks fuses checks into one scan; goldens per check") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "ok", 5.0), (None, "ok", -1.0),
      (Some(3L), "bad", 5.0), (Some(4L), "ok", 11.0)
    ).toDF("k", "status", "v")
    val got = Profile.dqRowChecks(df, Seq(
        "k_not_null" -> col("k").isNull,
        "status_ok" -> !col("status").isin("ok"),
        "v_range" -> (col("v") < 0.0 || col("v") > 10.0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      "k_not_null" -> (1L, 4L),
      "status_ok" -> (1L, 4L),
      "v_range" -> (2L, 4L)))
    // one aggregate scan: a single Aggregate over one relation
    val plan = Profile.dqRowChecks(df,
      Seq("a" -> col("k").isNull, "b" -> (col("v") > 0)))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one fused aggregate, got $plan")
  }

  test("dqUnique and dqReferential count excess rows and orphans") {
    import spark.implicits._
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "d"))
      .toDF("k", "p")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val u = Profile.dqUnique(child, Seq("k"), "k_unique").head()
    assert(u.getString(0) == "k_unique" &&
      u.getLong(1) == 1L && u.getLong(2) == 4L)
    val r = Profile.dqReferential(child, col("k"), parent, col("pk"),
      "k_in_parent").head()
    assert(r.getString(0) == "k_in_parent" &&
      r.getLong(1) == 1L && r.getLong(2) == 4L)
  }

  test("psiDrift: identical slices → 0; shifted slice → large PSI") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    val same = Profile.psiDrift(a, a, col("v"), 0.0, 10.0, 5)
      .collect()
    assert(same.length == 5)
    same.foreach { r => assert(r.getDouble(4) == 0.0) }
    // b concentrated in the top bins only
    val b = (1 to 100).map(i => 8.0 + (i % 2)).toDF("v")
    val drift = Profile.psiDrift(a, b, col("v"), 0.0, 10.0, 5)
      .collect()
    assert(drift.head.getDouble(4) > 0.25, s"psi ${drift.head.getDouble(4)}")
    // the grid is complete even where b is empty
    assert(drift.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }
}
