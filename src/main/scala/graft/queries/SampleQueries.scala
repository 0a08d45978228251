package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Deterministic sampling / split queries — exact oracle matches because
  * membership is a pure md5-prefix function of the key, identical in
  * both engines. */
object SampleQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ~10% reproducible sample of documents by doc_id.
    "q_sample" -> ((s, dir) =>
      Sampling.hashSample(Tables.load(s, dir, "documents"),
        col("doc_id"), num = 6554)
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // Deterministic train/val/test split: per-split doc counts + sizes.
    "q_split" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("split", Sampling.splitColumn(col("doc_id"),
          Seq(("test", 6554), ("val", 13108))))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("chars")))
  )

  private val pfx = Sampling.prefixSql("doc_id")

  val oracles: Map[String, String] = Map(
    "q_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE $pfx < '${"%04x".format(6554)}'""".stripMargin,

    "q_split" ->
      s"""SELECT CASE WHEN $pfx < '${"%04x".format(6554)}' THEN 'test'
         |  WHEN $pfx < '${"%04x".format(13108)}' THEN 'val'
         |  ELSE 'train' END AS split,
         | CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(SUM(n_chars) AS BIGINT) AS chars
         |FROM documents GROUP BY 1""".stripMargin
  )
}
