package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the "know your corpus" step of a training-data
  * pipeline: per-column statistics and value histograms as declarative
  * plans.
  *
  * Scale shape: [[tableProfile]] is two scans, both fully
  * partial-aggregable. Scan 1 computes every column's count/nulls/
  * min/max in ONE aggregate row (fused by whole-stage codegen) and
  * unpivots it with `stack` — no driver loop, no per-column job. Scan
  * 2 stacks (column, value) pairs and runs the shared HLL sketch
  * grouped by column — distinct-count state is 64 registers per
  * column, never a key shuffle. [[histogram]] with literal bounds is
  * one scan (the bin is one codegen'd floor).
  */
object Profile {

  /** One profile row per column: (col_name, n_vals, n_nulls, min_s,
    * max_s, ndv_approx); min/max are computed on the native type and
    * cast to string after. Columns must have engine-portable string
    * forms (integers/strings; floats format differently across
    * engines — cast them to DECIMAL first). */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        sum(col(c).isNull.cast("long")).as(s"__nul_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', __cnt_$c, __nul_$c, __min_$c, __max_$c"
    }.mkString(", ")
    val stats = one.selectExpr(
      s"stack(${cols.size}, $stackExpr) AS " +
        "(col_name, n_vals, n_nulls, min_s, max_s)")
    val valStack = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    val pairs = df
      .selectExpr(s"stack(${cols.size}, $valStack) AS (col_name, v)")
      .filter(col("v").isNotNull)
    val ndv = Sketch.approxCountDistinct(
      pairs, col("v"), "ndv_approx", Seq(col("col_name")))
    stats.join(ndv, "col_name")
  }

  /** Equi-width histogram of `value` with LITERAL bounds [lo, hi) and
    * `bins` buckets — single scan, one codegen'd floor per row; values
    * outside the bounds clamp to the edge bins. Returns
    * (bin, lo_edge, n_rows); empty bins are absent. */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val w = (hi - lo) / bins
    val raw = floor((value - lit(lo)) / lit(w)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    df.select(bin.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("lo_edge", lit(lo) + col("bin") * lit(w))
      .select(col("bin"), col("lo_edge"), col("n_rows"))
  }
}
