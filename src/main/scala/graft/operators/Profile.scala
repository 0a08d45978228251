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

  /** Row-level data-quality checks, ALL fused into one aggregate scan:
    * each entry is (check_name, violation predicate); the result has a
    * row per check — (check_name, violations, total). This is the
    * constraint-validation step of an ingest pipeline (not-null,
    * value-range, accepted-values, pattern checks…) priced at exactly
    * one partial-aggregated pass regardless of how many checks run. */
  def dqRowChecks(df: DataFrame,
                  checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.zipWithIndex.map { case ((_, viol), i) =>
      sum(viol.cast("long")).as(s"__v_$i")
    } :+ count(lit(1)).as("__tot")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot via the Column API, not selectExpr: check names are user
    // data, and interpolating them into SQL text is an injection
    // surface (Spark also concatenates adjacent string literals, so
    // even ''-doubled apostrophes get silently mangled).
    val entries = checks.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("check_name"), col(s"__v_$i").as("violations"))
    }
    one.select(explode(array(entries: _*)).as("__c"),
        col("__tot").as("total"))
      .select(col("__c.check_name"), col("__c.violations"), col("total"))
  }

  /** Key-uniqueness check: violations = excess rows beyond one per
    * distinct key (0 ⇔ the key is unique). One exact count-distinct
    * aggregate — the shuffle carries keys once, never rows.
    *
    * Null contract (matches SQL `COUNT(*) − COUNT(DISTINCT key)`): a
    * row whose key columns are ALL null contributes no distinct value,
    * i.e. every such row is a violation — a nullable "key" cannot
    * identify it. Without the null-out below, countDistinct over the
    * struct would count the all-null tuple as one legitimate key and
    * silently diverge from the SQL mirror. */
  def dqUnique(df: DataFrame, keys: Seq[String],
               name: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val anyNonNull = keys.map(col(_).isNotNull).reduce(_ || _)
    df.select(when(anyNonNull, struct(keys.map(col): _*)).as("__k"))
      .agg((count(lit(1)) - countDistinct(col("__k"))).as("violations"),
        count(lit(1)).as("total"))
      .select(lit(name).as("check_name"), col("violations"), col("total"))
  }

  /** Referential-integrity check: violations = child rows whose
    * non-null key has no match in the parent (orphans), via one
    * left-anti join against the parent's distinct keys — Catalyst
    * broadcasts the key set when the parent is dimension-sized.
    *
    * Null contract: null CHILD keys are not orphans (filtered below),
    * and null PARENT keys are ignored (explicit filter — an equi-join
    * never matches on null anyway, but a SQL `NOT IN` mirror returns
    * zero rows the moment the parent contains one null, so the filter
    * keeps both sides on the same documented semantics). */
  def dqReferential(child: DataFrame, childKey: Column,
                    parent: DataFrame, parentKey: Column,
                    name: String): DataFrame = {
    val orphans = child.select(childKey.as("__k"))
      .filter(col("__k").isNotNull)
      .join(parent.select(parentKey.as("__k"))
          .filter(col("__k").isNotNull).distinct(),
        Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val tot = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(tot)
      .select(lit(name).as("check_name"), col("violations"), col("total"))
  }

  /** Population-stability-index drift between two slices of one
    * numeric column — "did this month's corpus shift against the
    * reference?", the monitoring gate before a silent distribution
    * change poisons a model.
    *
    * Both slices histogram into the same literal equal-width
    * [lo, hi)·bins grid ([[histogram]]'s codegen'd floor bin — one
    * partial-aggregated scan per slice, bin counts are the only
    * shuffle). Empty bins participate through an ε=1e-6 proportion
    * clamp (the standard PSI convention, and it keeps ln finite).
    * Per bin: `term = (pa − pb) · ln(pa/pb)` in a fixed IEEE op
    * order; the total stages terms through DECIMAL(38,18) so it is
    * summation-order-free. Returns one row per bin —
    * (bin, na, nb, term, psi) — with term/psi rounded to 6 dp
    * (ln is libm; 1-ulp engine divergence is invisible at 6 dp).
    * Rule of thumb: psi < 0.1 stable, > 0.25 shifted. */
  def psiDrift(a: DataFrame, b: DataFrame, value: Column,
               lo: Double, hi: Double, bins: Int): DataFrame = {
    val spark = a.sparkSession
    val ha = histogram(a, value, lo, hi, bins)
      .select(col("bin"), col("n_rows").as("na"))
    val hb = histogram(b, value, lo, hi, bins)
      .select(col("bin"), col("n_rows").as("nb"))
    val grid = spark.range(bins).select(col("id").as("bin"))
      .join(ha, Seq("bin"), "left").join(hb, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tots = grid.agg(sum(col("na")).cast("double").as("__ta"),
      sum(col("nb")).cast("double").as("__tb"))
    val eps = lit(1e-6)
    val pa = when(col("na") === 0, eps)
      .otherwise(col("na").cast("double") / col("__ta"))
    val pb = when(col("nb") === 0, eps)
      .otherwise(col("nb").cast("double") / col("__tb"))
    val terms = grid.crossJoin(broadcast(tots))
      .withColumn("__term", (pa - pb) * log(pa / pb))
    val total = terms
      .agg(round(sum(col("__term").cast("decimal(38,18)"))
        .cast("double"), 6).as("psi"))
    terms.crossJoin(broadcast(total))
      .select(col("bin"), col("na"), col("nb"),
        (round(col("__term"), 6) + lit(0.0)).as("term"),
        (col("psi") + lit(0.0)).as("psi"))
  }
}
