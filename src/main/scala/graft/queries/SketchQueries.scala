package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sketch

/** Sketch queries: the engine-portable deterministic HLL next to the
  * exact answer it approximates (the differential proves BOTH the
  * estimate arithmetic and that the sketch state is cross-engine
  * identical). */
object SketchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Approximate distinct users per event type, with the exact count
    // alongside (exact side shuffles keys; sketch side shuffles ≤64
    // registers per group — the 100 TB trade in one plan).
    "q_approx_distinct" -> ((s, dir) => {
      val events = Tables.load(s, dir, "events")
      val approx = Sketch.approxCountDistinct(
        events, col("user_id"), "n_approx", Seq(col("event_type")))
      val exact = events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(broadcast(approx), "event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_approx_distinct" -> {
      val est = Sketch.estimateSql(
        "events", "user_id", "event_type", "n_approx")
      s"""WITH approx AS ($est),
         |exact AS (
         | SELECT event_type,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
         | FROM events GROUP BY 1)
         |SELECT e.event_type, e.n_exact, a.n_approx
         |FROM exact e JOIN approx a USING (event_type)""".stripMargin
    }
  )
}
