package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams: ordered funnels and
  * cohort retention — the clickstream shapes every analytics engine is
  * asked for, expressed as declarative keyed aggregates/joins so
  * Catalyst supplies partial aggregation and join selection.
  *
  * Scale notes: both operators reduce to per-user state of a few
  * timestamps. The funnel is a chain of keyed equi-joins between
  * per-user ONE-ROW aggregates (never raw event × event); retention is
  * one distinct + one keyed join + one hash aggregate. Nothing is
  * quadratic in events, and no per-user array ever materializes.
  */
object Behavior {

  /** Ordered funnel: how many users reach each step, where step i+1
    * counts only events STRICTLY after the user's earliest completion
    * of step i (the classic conversion-funnel semantics; same-timestamp
    * events do not satisfy "after").
    *
    * Output: (step_idx 1-based, step, n_users) — one row per step,
    * monotone non-increasing counts.
    */
  def funnelSteps(events: DataFrame, user: Column, ts: Column, step: Column,
                  steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(user.as("__u"), ts.as("__ts"), step.as("__s"))
    val reached = steps.tail.scanLeft(
      base.filter(col("__s") === steps.head)
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))) {
      (prev, s) =>
        base.filter(col("__s") === s)
          .join(prev.select(col("__u"), col("__t").as("__pt")), Seq("__u"))
          .filter(col("__ts") > col("__pt"))
          .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    }
    reached.zip(steps).zipWithIndex.map { case ((df, s), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(s).as("step"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Event-transition (first-order Markov) counts: per user, order the
    * stream by (ts, step — the step tiebreak makes same-instant events
    * deterministic), take consecutive pairs, and count each
    * (prev, next) transition with its row probability
    * `n / Σ_next n` (one exact integer division per cell).
    *
    * One keyed window (lag, O(1) state) + one hash aggregate + one
    * tiny window over the transition matrix itself (|steps|² rows).
    * Output: (prev_step, next_step, n, p). */
  def transitions(events: DataFrame, user: Column, ts: Column,
                  step: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__ts"), col("__s"))
    val rowW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("prev_step"))
    events.select(user.as("__u"), ts.as("__ts"), step.as("__s"))
      .withColumn("__p", lag(col("__s"), 1).over(w))
      .filter(col("__p").isNotNull)
      .groupBy(col("__p").as("prev_step"), col("__s").as("next_step"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(rowW))
  }

  /** Cohort retention: users grouped by their first-active time bucket
    * (`ts DIV bucket` — e.g. epoch-day for daily cohorts), counted in
    * every later bucket they return in. Output: (cohort, offset,
    * n_users) where offset 0 is the cohort's own bucket, so
    * n_users(cohort, 0) is the cohort size and retention(k) =
    * n_users(cohort, k) / n_users(cohort, 0). */
  /** Linear multi-touch attribution: each conversion's value is split
    * equally across the user's touch events inside the trailing
    * `lookback` window (touch time in `[conv_t − lookback, conv_t]`,
    * inclusive); per touch event the credits are summed. Conversions
    * with no in-window touch get no attribution row (the "direct"
    * bucket is the caller's complement).
    *
    * Shape: candidate (conversion, touch) pairs come from
    * [[Series.rangeJoin]]'s bucket-replication equi-join on
    * (user, time-bucket) — never a per-user cross product — then one
    * keyed window (count per conversion) and one hash aggregate per
    * touch. Per-pair credits are decimal-staged so the per-touch sum is
    * order-free; 6 dp cut. Output: (event_id, n_conversions, credit).
    */
  def attributionLinear(events: DataFrame, user: Column, ts: Column,
                        typ: Column, value: Column, id: Column,
                        convType: String, touchTypes: Seq[String],
                        lookback: Long): DataFrame = {
    require(lookback > 0, "lookback must be positive")
    val base = events.select(user.as("u"), ts.as("t"), typ.as("__ty"),
      value.as("__v"), id.as("__eid"))
    val conv = base.filter(col("__ty") === convType)
      .select(col("u"), col("t"), col("__v").as("v"),
        col("__eid").as("conv_id"))
    val touch = base.filter(col("__ty").isin(touchTypes: _*))
      .select(col("u"), col("t"), col("__eid").as("touch_id"))
    val pairs = Series.rangeJoin(conv, touch, key = "u", time = "t",
      delta = lookback, payload = Seq("t", "touch_id"))
      .filter(col("r_t") <= col("t"))
    val perConv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id"))
    pairs
      .withColumn("__n", count(lit(1)).over(perConv))
      .select(col("r_touch_id").as("event_id"),
        (col("v") / col("__n")).cast("decimal(27,18)").as("__c"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col("__c")).cast("double"), 6).as("credit"))
  }

  def cohortRetention(events: DataFrame, user: Column, ts: Column,
                      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val e = events.select(user.as("__u"), ts.as("__ts"))
      .withColumn("__d", expr(s"__ts DIV $bucket"))
    val first = e.groupBy(col("__u")).agg(min(col("__d")).as("__d0"))
    e.select(col("__u"), col("__d")).distinct()
      .join(first, Seq("__u"))
      .groupBy(col("__d0").as("cohort"), (col("__d") - col("__d0")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
