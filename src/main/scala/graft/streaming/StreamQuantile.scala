package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming quantiles — the online member of the sketch family
  * (HLL = [[StreamSketch]], count-min = [[StreamCms]], quantile =
  * here): per group, a fixed-width bin histogram held in
  * `mapGroupsWithState`, updated per micro-batch, emitting running
  * rank-selected quantile estimates.
  *
  * Estimator: `bin = floor(value / binWidth)`; the q-quantile is the
  * LOWER EDGE of the smallest bin whose cumulative count reaches
  * `ceil(q·n)` — deterministic integer/IEEE arithmetic end-to-end, so
  * a batch execution hash-matches a DuckDB mirror of the same
  * arithmetic, and the streaming state after the last trigger is
  * IDENTICAL to the batch histogram (bin counting is a commutative
  * merge; arrival order and batching cannot change it). Error is
  * bounded by `binWidth`, the operator's resolution/state dial.
  *
  * Scale design: state per group = one (bin → count) entry per
  * OCCUPIED bin — bounded by value-range/binWidth, independent of row
  * count (the point of a quantile sketch over a stream). The batch
  * form of the same histogram shape, partial-aggregated rather than
  * stateful, is `Stats.quantileByGroup`; this operator is its
  * unbounded-stream twin.
  */
object StreamQuantile {

  case class QuantEst(g: String, n: Long, p50: Double, p90: Double)
  private[streaming] case class Hist(bins: Map[Long, Long])

  private def rankSelect(bins: Map[Long, Long], n: Long, q: Double,
                         binWidth: Double): Double = {
    val target = math.ceil(q * n).toLong
    var cum = 0L
    val it = bins.keys.toArray.sorted.iterator
    while (it.hasNext) {
      val b = it.next()
      cum += bins(b)
      if (cum >= target) return b.toDouble * binWidth
    }
    Double.NaN // unreachable for n > 0
  }

  private def core(ds: Dataset[(String, Double)],
                   binWidth: Double): Dataset[QuantEst] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[Hist, QuantEst](GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[(String, Double)],
         state: GroupState[Hist]) =>
          var bins = state.getOption.map(_.bins).getOrElse(Map.empty)
          rows.foreach { r =>
            val b = math.floor(r._2 / binWidth).toLong
            bins = bins.updated(b, bins.getOrElse(b, 0L) + 1L)
          }
          state.update(Hist(bins))
          val n = bins.valuesIterator.sum
          QuantEst(g, n, rankSelect(bins, n, 0.5, binWidth),
            rankSelect(bins, n, 0.9, binWidth))
      }
  }

  /** Batch form: per-group binned p50/p90 over a bounded frame. */
  def quantiles(df: DataFrame, group: Column, value: Column,
                binWidth: Double, groupOut: String = "g"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    core(df.select(group.cast("string"), value.cast("double"))
      .as[(String, Double)], binWidth)
      .toDF(groupOut, "n", "p50", "p90")
  }

  /** Streaming form: running per-group estimates, updated each
    * micro-batch (use OutputMode.Update). */
  def quantilesStream(ds: Dataset[(String, Double)],
                      binWidth: Double): Dataset[QuantEst] =
    core(ds, binWidth)
}
