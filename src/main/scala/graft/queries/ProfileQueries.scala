package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Profile, Sketch}

/** Profiling queries: per-column statistics (with the portable-HLL
  * ndv) and a fixed-bound histogram. */
object ProfileQueries {

  private val ProfCols = Seq("event_id", "user_id", "event_type", "props")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_profile" -> ((s, dir) =>
      Profile.tableProfile(Tables.load(s, dir, "events"), ProfCols)),

    "q_histogram" -> ((s, dir) =>
      Profile.histogram(Tables.load(s, dir, "orders"),
        col("o_totalprice"), lo = 0.0, hi = 600000.0, bins = 12)),

    // Association screening: is event type independent of time-of-day
    // quadrant? One contingency-table scan; the statistic's term sum is
    // decimal-staged (order-free) so both engines agree at 6 dp.
    "q_chi2" -> ((s, dir) =>
      Profile.chiSquare(Tables.load(s, dir, "events"),
        col("event_type"),
        expr("((ts div 3600000000000) % 24) div 6")))
  )

  /** Mirror of the two-scan profile: a stats UNION ALL branch per
    * column, plus the stacked-pairs HLL pipeline (same registers as
    * [[Sketch.estimateSql]], grouped by col_name). */
  private val profileOracle: String = {
    val pairs = ProfCols.map(c =>
      s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM events")
      .mkString("\n UNION ALL ")
    val stats = ProfCols.map(c =>
      s"""SELECT '$c' AS col_name, CAST(COUNT($c) AS BIGINT) AS n_vals,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  CAST(MIN($c) AS VARCHAR) AS min_s,
         |  CAST(MAX($c) AS VARCHAR) AS max_s
         | FROM events""".stripMargin)
      .mkString("\n UNION ALL ")
    val scale = "18446744073709551616"
    s"""WITH pairs AS (
       | $pairs),
       |pnn AS (SELECT * FROM pairs WHERE v IS NOT NULL),
       |regs AS (
       | SELECT col_name, ${Sketch.bucketSql("v")} AS bucket,
       |  MAX(${Sketch.rhoSql("v")}) AS m
       | FROM pnn GROUP BY 1, 2),
       |sums AS (
       | SELECT col_name,
       |  SUM(CAST(POWER(2, 64 - m) AS DECIMAL(38,0)))
       |    + (64 - COUNT(*)) * CAST('$scale' AS DECIMAL(38,0)) AS s,
       |  CAST(64 - COUNT(*) AS DOUBLE) AS v
       | FROM regs GROUP BY 1),
       |est AS (
       | SELECT col_name,
       |  CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE)
       |    * CAST('$scale' AS DECIMAL(38,0))::DOUBLE / CAST(s AS DOUBLE)
       |    AS raw, v
       | FROM sums),
       |ndv AS (
       | SELECT col_name,
       |  ROUND(CASE WHEN raw <= CAST(160.0 AS DOUBLE) AND v > 0
       |    THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / v)
       |    ELSE raw END, 3) AS ndv_approx
       | FROM est),
       |stats AS (
       | $stats)
       |SELECT st.col_name, st.n_vals, st.n_nulls, st.min_s, st.max_s,
       | n.ndv_approx
       |FROM stats st JOIN ndv n USING (col_name)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_profile" -> profileOracle,

    // All literals cast to DOUBLE: bare 50000.0 is DECIMAL in DuckDB
    // and would change the arithmetic type (and the hash) vs Spark.
    "q_histogram" ->
      """SELECT bin,
        | CAST(0.0 AS DOUBLE) + bin * CAST(50000.0 AS DOUBLE) AS lo_edge,
        | CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM (SELECT LEAST(GREATEST(
        |   CAST(FLOOR((o_totalprice - CAST(0.0 AS DOUBLE))
        |     / CAST(50000.0 AS DOUBLE)) AS BIGINT), 0), 11)
        |   AS bin FROM orders)
        |GROUP BY bin""".stripMargin,

    "q_chi2" ->
      """WITH p AS (
        |  SELECT event_type AS a,
        |   ((epoch_ns(ts) // 3600000000000) % 24) // 6 AS b FROM events),
        |obs AS (SELECT a, b, COUNT(*) AS o FROM p GROUP BY 1, 2),
        |ra AS (SELECT a, SUM(o) AS ra FROM obs GROUP BY 1),
        |rb AS (SELECT b, SUM(o) AS rb FROM obs GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM obs),
        |grid AS (
        |  SELECT ra.a, rb.b, ra.ra, rb.rb, COALESCE(obs.o, 0) AS o
        |  FROM ra CROSS JOIN rb
        |  LEFT JOIN obs ON obs.a = ra.a AND obs.b = rb.b),
        |terms AS (
        |  SELECT a, b,
        |   CAST((CAST(o AS DOUBLE) - CAST(ra * rb AS DOUBLE) / nn.n)
        |     * (CAST(o AS DOUBLE) - CAST(ra * rb AS DOUBLE) / nn.n)
        |     / (CAST(ra * rb AS DOUBLE) / nn.n) AS DECIMAL(38,18)) AS t
        |  FROM grid, nn)
        |SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n,
        | CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT)
        |   AS dof,
        | ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2
        |FROM terms""".stripMargin
  )
}
