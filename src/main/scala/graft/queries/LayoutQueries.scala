package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ZOrderKey

/** Z-order layout queries: Morton-key clustering statistics over
  * lineitem's (part, supplier) plane. Fixed-width key ranges (z >> 16)
  * stand in for files so the bucketing is deterministic and the native
  * interleave expression oracle-checks bit-for-bit against DuckDB
  * integer arithmetic; [[graft.operators.Layout]]'s range-partitioned
  * write path is covered by LayoutSpec (its sampled boundaries are not
  * cross-engine reproducible).
  */
object LayoutQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-z-range footer stats: row count + min/max of BOTH dimensions.
    // Tight ranges on both axes are what parquet min/max skipping prunes
    // with — one sort at write time buys two-dimensional pruning.
    "q_zorder" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(
          ZOrderKey.zorder(col("l_partkey"), col("l_suppkey")).as("z"),
          col("l_partkey"), col("l_suppkey"))
        .groupBy(shiftright(col("z"), 16).as("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("x_min"), max("l_partkey").as("x_max"),
          min("l_suppkey").as("y_min"), max("l_suppkey").as("y_max")))
  )

  val oracles: Map[String, String] = Map(
    "q_zorder" -> {
      val z = ZOrderKey.zorderSql("l_partkey", "l_suppkey")
      s"""SELECT ($z >> 16) AS z_bucket,
         | CAST(COUNT(*) AS BIGINT) AS n_rows,
         | MIN(l_partkey) AS x_min, MAX(l_partkey) AS x_max,
         | MIN(l_suppkey) AS y_min, MAX(l_suppkey) AS y_max
         |FROM lineitem GROUP BY 1""".stripMargin
    }
  )
}
