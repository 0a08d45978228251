package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null-repair operators for ingest cleaning — the fill/drop surface a
  * training-data pipeline applies before any aggregate or model kernel
  * sees the column. The reference engine has no null story at all (its
  * arrays are dense; see `/root/reference/src/api.jl` — missing data is
  * a pre-processing concern there too), so this module is part of the
  * beyond-reference cleaning surface alongside [[Dedup]] and
  * [[graft.functions.Text]].
  */
object Clean {

  /** Rows where every listed column is non-null (SQL `IS NOT NULL`
    * conjunction — rides the scan as a codegen'd filter, and parquet
    * null-count statistics prune whole row groups of all-null data). */
  def dropNulls(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** Impute nulls in `value` with the EXACT per-`grp` type-1 quantile
    * of the observed (non-null) values — median at `permille` = 500.
    * A rank-selected quantile is an actual data value (not an
    * interpolated float), so downstream decimal-exact aggregation over
    * the filled column stays engine-exact — the property a mean-fill
    * destroys.
    *
    * Scale: the quantile table is one row per group
    * ([[Stats.quantileByGroup]] — two-pass range refinement, no
    * per-group sort) and is BROADCAST back, so the fill itself is a
    * map-side `coalesce` in the scan stage; no extra shuffle of the
    * fact table. Groups with no observed values keep their nulls
    * (left-join semantics). Output = input columns plus
    * `<value>_filled` and boolean `<value>_was_null`. */
  def imputeGroupQuantile(df: DataFrame, grp: String, value: String,
                          permille: Int = 500): DataFrame = {
    val q = Stats.quantileByGroup(
      df.filter(col(value).isNotNull), grp, col(value), permille)
    df.join(broadcast(q), Seq(grp), "left")
      .withColumn(s"${value}_filled", coalesce(col(value), col("quantile")))
      .withColumn(s"${value}_was_null", col(value).isNull)
      .drop("quantile")
  }

  /** Winsorize `value` per `grp`: clip to the EXACT rank-selected
    * [`loPermille`, `hiPermille`] quantiles of the group. Rank-selected
    * cut points are actual data values (same engine-exactness argument
    * as [[imputeGroupQuantile]]), so decimal aggregation over the
    * clipped column hash-matches across engines.
    *
    * Scale shape: the cut-point table is one row per group — two
    * quantile passes, each partial-aggregated, no per-group sort — and
    * is BROADCAST back, so the clip itself is a codegen'd
    * `greatest(lo, least(hi, v))` riding the scan stage; the fact
    * table never shuffles. Output = input columns plus
    * `<value>_clipped` and boolean flags `<value>_clipped_lo` /
    * `<value>_clipped_hi`. */
  def winsorizeByGroup(df: DataFrame, grp: String, value: String,
                       loPermille: Int = 50,
                       hiPermille: Int = 950): DataFrame = {
    require(0 < loPermille && loPermille < hiPermille && hiPermille < 1000,
      s"need 0 < lo < hi < 1000, got ($loPermille, $hiPermille)")
    val nn = df.filter(col(value).isNotNull)
    // both cut points from ONE quantile computation — the fact-table
    // passes are rank-independent, so [lo, hi] costs the same scans as
    // a single quantile; the pivot runs on one row per (group, rank)
    val cuts = Stats
      .quantilesByGroup(nn, grp, col(value), Seq(loPermille, hiPermille))
      .groupBy(col(grp))
      .agg(
        max(when(col("permille") === loPermille, col("quantile")))
          .as("__lo"),
        max(when(col("permille") === hiPermille, col("quantile")))
          .as("__hi"))
    df.join(broadcast(cuts), Seq(grp), "left")
      // greatest/least SKIP nulls, so an unguarded clip would fabricate
      // the hi cut for a null value — nulls must stay null (flags false)
      .withColumn(s"${value}_clipped", when(col(value).isNull, lit(null))
        .otherwise(greatest(col("__lo"), least(col("__hi"), col(value)))))
      .withColumn(s"${value}_clipped_lo",
        col(value).isNotNull && col(value) < col("__lo"))
      .withColumn(s"${value}_clipped_hi",
        col(value).isNotNull && col(value) > col("__hi"))
      .drop("__lo", "__hi")
  }
}
