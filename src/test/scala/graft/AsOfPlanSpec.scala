package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Series
import graft.plans.{AsOfJoinExec, AsOfJoinPlan}

/** Custom Catalyst as-of join (logical plan + strategy + physical
  * merge + pushdown rule): differential equivalence with the
  * compositional window formulation, null/unmatched semantics, plan
  * shape, and the filter-pushdown optimizer rule. */
class AsOfPlanSpec extends SparkSpec {

  private def trades = {
    import spark.implicits._
    Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 25L, 102L),
      (2L, 5L, 200L), (2L, 50L, 201L),
      (3L, 7L, 300L) // key with no quotes at all
    ).toDF("key", "time", "trade_id")
  }

  private def quotes = {
    import spark.implicits._
    Seq(
      (1L, 9L, 1.0), (1L, 20L, 2.0), (1L, 20L, 3.0), (1L, 24L, 4.0),
      (2L, 6L, 5.0)
    ).toDF("key", "time", "px")
  }

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("matches golden backward-as-of semantics incl. ties and misses") {
    val r = AsOfJoinPlan.asofJoin(trades, quotes, "key", "time", Seq("px"))
      .orderBy("key", "time").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(r.toSeq == Seq(
      (1L, 10L, Some(9L), Some(1.0)),   // strictly before
      (1L, 20L, Some(20L), Some(3.0)),  // tie → last in payload order
      (1L, 25L, Some(24L), Some(4.0)),
      (2L, 5L, None, None),             // no quote yet
      (2L, 50L, Some(6L), Some(5.0)),
      (3L, 7L, None, None)))            // key never quoted
  }

  test("differential: physical operator == compositional window formulation") {
    def side(t: String) = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === t)
      .select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("us"))
    val viaPlan = AsOfJoinPlan.asofJoin(side("purchase"), side("click"),
      "user_id", "us", Seq("event_id"))
    val viaWindow = Series.asofJoin(side("purchase"), side("click"),
      "user_id", "us", Seq("event_id"))
    assert(viaPlan.columns.toSeq == viaWindow.columns.toSeq)
    assert(canon(viaPlan) == canon(viaWindow))
    assert(viaPlan.count() > 0)
  }

  test("plans to AsOfJoinExec with co-partitioned sorted children") {
    val df = AsOfJoinPlan.asofJoin(trades, quotes, "key", "time", Seq("px"))
    df.collect() // materialize the AQE final plan
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[AsOfJoinExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.executedPlan)
      // query stages are leaf nodes — collect() won't descend into them
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        unwrap(q.plan)
      case e: AsOfJoinExec =>
        e +: e.children.flatMap(unwrap)
      case other => other.children.flatMap(unwrap)
    }
    val execs = unwrap(df.queryExecution.executedPlan)
    assert(execs.size == 1)
    // both children must arrive shuffled on key + sorted
    val e = execs.head
    assert(e.requiredChildDistribution.size == 2)
    assert(e.requiredChildOrdering.forall(_.nonEmpty))
  }

  test("string (non-primitive) join keys: cached match key survives row reuse") {
    // The merge caches the current match's key across right-iterator
    // advances; for buffer-backed types (UTF8String here) that cache
    // must be a copy — this pins the semantics on a key type where a
    // stale pointer would mis-compare.
    import spark.implicits._
    val l = Seq(("aa", 10L, 1L), ("bb", 10L, 2L), ("cc", 10L, 3L))
      .toDF("key", "time", "trade_id")
    val r = Seq(("aa", 5L, 1.0), ("aa", 6L, 1.5), ("bb", 7L, 2.0),
      ("cc", 9L, 3.0)).toDF("key", "time", "px")
    val got = AsOfJoinPlan.asofJoin(l, r, "key", "time", Seq("px"))
      .orderBy("key").collect()
      .map(x => (x.getString(0), Option(x.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(("aa", Some(1.5)), ("bb", Some(2.0)),
      ("cc", Some(3.0))))
  }

  test("left-only filters push below the join; payload filters stay above") {
    val df = AsOfJoinPlan.asofJoin(trades, quotes, "key", "time", Seq("px"))
      .filter(col("trade_id") > 100L && col("asof_px").isNotNull)
    val opt = df.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    // the trade_id conjunct must now live under the join's left child
    assert(aj.left.toString.contains("trade_id"),
      s"left-side filter not pushed:\n$opt")
    val aboveFilters = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinPlan] => f }
    assert(aboveFilters.exists(_.condition.toString.contains("asof_px")))
    assert(!aboveFilters.exists(_.condition.toString.contains("trade_id")))
    // and the result is still correct
    assert(df.count() == 3) // trades 101 (tie), 102, and 201
  }
}
