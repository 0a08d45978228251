package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables
import graft.sources.TextIO

/** Source/sink round-trip queries — the §2.1 DataSource/DataSink surface.
  * Each query writes through a sink format and reads back before
  * aggregating, so the oracle (which reads the original parquet) only
  * matches if the round-trip is lossless.
  */
object SourceQueries {

  private val ordersKeys = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType)))

  private def tmp(dir: String, tag: String): String =
    s"/tmp/graft_io_${tag}_${Integer.toHexString(dir.hashCode)}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TXT sink → TXT source → aggregate (DataSource/DataSink TXT parity,
    // reference src/api.jl:22-25). Long columns round-trip exactly
    // through text.
    "q_txt_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "txt")
      TextIO.writeDelimited(
        Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"), path)
      TextIO.readDelimited(s, path, ordersKeys)
        .groupBy((col("o_custkey") % 100).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("key_sum"))
    }),

    // JSON-lines sink → source → aggregate. Strings/longs round-trip
    // exactly through JSON; schema declared on read (no inference).
    "q_json_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "json")
      TextIO.writeJsonLines(
        Tables.load(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        path)
      TextIO.readJsonLines(s, path, StructType(Seq(
        StructField("doc_id", LongType), StructField("lang",
          org.apache.spark.sql.types.StringType),
        StructField("n_chars", LongType))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
          sum(col("doc_id")).as("id_sum"))
    }),

    // Columnar (parquet) sink round-trip — DataSink(HDF5) parity: the
    // full orders table through the columnar sink, then a grouped
    // aggregate with doubles (exactness via decimal staging).
    "q_columnar_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "col")
      TextIO.writeColumnar(Tables.load(s, dir, "orders"), path)
      TextIO.readColumnar(s, path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("price_sum"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_txt_roundtrip" ->
      """SELECT o_custkey % 100 AS bucket,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY 1""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(n_chars) AS BIGINT) AS chars,
        | CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 1""".stripMargin,

    "q_columnar_roundtrip" ->
      """SELECT o_orderstatus,
        | CAST(COUNT(*) AS BIGINT) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM orders GROUP BY 1""".stripMargin
  )
}
