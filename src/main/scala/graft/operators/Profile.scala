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

  /** Pearson chi-square test of association between two categorical
    * columns — "is this quality signal independent of that segment?",
    * the screening step before trusting a filter to behave uniformly
    * across languages/domains/time.
    *
    * Scale shape: ONE partial-aggregated scan builds the contingency
    * table; everything after runs on the table itself, whose size is
    * |A|·|B| cells (categoricals — tiny by assumption), via cell-table
    * self-aggregates and broadcast joins. Absent cells still contribute
    * (0−e)²/e = e, so the cell grid is completed by a row-total ×
    * col-total cross of the SMALL marginal tables, never a scan of the
    * data. Determinism: observed counts and marginals are exact longs;
    * each cell's term is a fixed double-op sequence; the term SUM is
    * staged through DECIMAL(38,18) so it is summation-order-free —
    * the statistic hash-matches an engine mirror at 6 dp.
    *
    * Returns one row: (n, dof, chi2). */
  def chiSquare(df: DataFrame, a: Column, b: Column): DataFrame = {
    // Complete-case analysis: null categories are EXCLUDED up front.
    // (Left in, they would corrupt the statistic silently: the grid's
    // equi-join can never match a null key, so a null category's
    // observed counts become 0 while its marginals still inflate every
    // expected count.) Callers who want null as a level should
    // coalesce it to a sentinel value first.
    val obs = df.filter(a.isNotNull && b.isNotNull)
      .groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowTot = obs.groupBy(col("__a"))
      .agg(sum(col("__o")).as("__ra"))
    val colTot = obs.groupBy(col("__b"))
      .agg(sum(col("__o")).as("__rb"))
    val grid = rowTot.crossJoin(broadcast(colTot))
      .join(obs, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val e = (col("__ra") * col("__rb")).cast("double") / col("__n")
    grid
      .crossJoin(broadcast(obs.agg(sum(col("__o")).cast("double").as("__n"))))
      // DECIMAL(38,18), not (27,18): a single term can reach ~N (a
      // strongly associated pair over billions of rows), and 9 integer
      // digits would overflow the cast to null — silently DROPPED from
      // the sum. 20 integer digits put overflow beyond any real corpus.
      .withColumn("__term",
        ((col("__o").cast("double") - e) * (col("__o").cast("double") - e)
          / e).cast("decimal(38,18)"))
      .agg(
        max(col("__n")).cast("long").as("n"),
        ((countDistinct(col("__a")) - 1) *
          (countDistinct(col("__b")) - 1)).as("dof"),
        round(sum(col("__term")).cast("double"), 6).as("chi2"))
  }
}
