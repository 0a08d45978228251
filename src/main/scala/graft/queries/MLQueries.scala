package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.ML

/** ML-kernel queries (reference §2.9 surface). Closed-form OLS is
  * oracle-matched; the spark.ml kernels are seeded-deterministic but not
  * SQL-expressible → rows-only + MLSpec golden tests.
  */
object MLQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Closed-form OLS: l_extendedprice ~ l_quantity from exact decimal
    // sufficient statistics (one distributed aggregate).
    "q_ml_ols" -> ((s, dir) =>
      ML.olsExact(Tables.load(s, dir, "lineitem"),
        col("l_quantity"), col("l_extendedprice"))),

    // Kmeans(points, k, iters) on the embeddings table.
    "q_ml_kmeans" -> ((s, dir) =>
      ML.kmeans(Tables.load(s, dir, "embeddings"), "embedding",
        k = 8, iters = 10)
        .select(col("cluster"), col("size"))),

    // NaiveBayes(points, responses, classes) — gaussian, per-row preds.
    "q_ml_nb" -> ((s, dir) =>
      ML.naiveBayes(Tables.load(s, dir, "embeddings"),
        "embedding", "label", "vec_id")),

    // Iterative logistic regression (reference flagship loop shape):
    // binary label = (label % 2), 5 gradient-descent iterations.
    "q_ml_logreg" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("y", (col("label") % 2).cast("double"))
      ML.logisticRegression(e, "embedding", "y", dim = 64,
        iters = 5, lr = 0.5)
        .select(posexplode(col("weights")).as(Seq("idx", "w")))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_ml_ols" ->
      """WITH s AS (SELECT
        |  CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        | FROM lineitem),
        |sl AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |  n, sx, sy FROM s)
        |SELECT slope, sy / n - slope * (sx / n) AS intercept FROM sl""".stripMargin
  )
}
