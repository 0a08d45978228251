package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the pattern that keeps a
  * 100 TB rollup fresh without recomputing the world: aggregate the
  * day's delta, then COMBINE it with yesterday's aggregate state.
  * Works for any decomposable aggregate whose combine is itself an
  * aggregate over partial states: counts and sums combine by sum,
  * min/max by min/max. (Exact count-distinct is NOT decomposable —
  * that is what [[Sketch]]'s mergeable HLL registers are for.)
  *
  * Scale shape: the combine aggregates |keys-in-state| + |keys-in-
  * delta| rows — both already aggregate-sized, shuffled on the same
  * keys — so maintenance cost tracks the DELTA, not the history.
  */
object Incremental {

  /** Combine two (or more, via repeated calls) aggregate states with
    * the same schema: `keys` ++ `sumCols` (counts and sums — combined
    * by SUM) ++ `minCols` ++ `maxCols`. */
  def mergeAggStates(state: DataFrame, deltaState: DataFrame,
                     keys: Seq[String], sumCols: Seq[String],
                     minCols: Seq[String] = Nil,
                     maxCols: Seq[String] = Nil): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    require(aggs.nonEmpty, "nothing to combine")
    state.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
