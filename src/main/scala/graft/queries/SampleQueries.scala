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
          sum(col("n_chars")).as("chars"))),

    // Corpus mixing: per-language sampling rates (down-weight the
    // dominant language, keep the rest whole), then the per-language
    // doc/char budget actually achieved. The mix predicate is a
    // codegen'd when-chain in the scan stage — one pass over the
    // corpus, no join, no shuffle beyond the final small aggregate.
    "q_mix" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.load(s, dir, "documents"),
        col("doc_id"), col("lang"),
        rates = Seq("en" -> 16384, "de" -> 49152), defaultNum = 65536)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"))),

    // Quota sampling: exactly 5 docs per language, drawn by content-hash
    // priority on the native bounded-heap aggregate (no window sort).
    "q_reservoir" -> ((s, dir) =>
      Sampling.reservoirPerGroup(Tables.load(s, dir, "documents"),
        col("lang"), col("doc_id"), k = 5)
        .select(col("grp").as("lang"), col("pick").as("doc_id")))
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
         |FROM documents GROUP BY 1""".stripMargin,

    "q_mix" ->
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(n_chars) AS BIGINT) AS chars
         |FROM documents
         |WHERE CASE WHEN lang = 'en' THEN $pfx < '${"%04x".format(16384)}'
         |  WHEN lang = 'de' THEN $pfx < '${"%04x".format(49152)}'
         |  ELSE TRUE END
         |GROUP BY lang""".stripMargin,

    // 12 hex chars compare lexicographically == numerically (fixed
    // width), mirroring the Spark side's negated 48-bit priority.
    "q_reservoir" ->
      """SELECT lang, doc_id FROM (
        | SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang
        |   ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 12),
        |            doc_id) AS rn
        | FROM documents)
        |WHERE rn <= 5""".stripMargin
  )
}
