package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Link-analysis queries. The graph is the part–supplier incidence of
  * lineitem made symmetric (an undirected supply graph: rank ≈ how
  * central a part/supplier is in the sourcing network); node ids are
  * prefixed 'p'/'s' to keep the two key spaces distinct.
  */
object GraphQueries {

  private val Iters = 3

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.load(s, dir, "lineitem")
      .select(
        concat(lit("p"), col("l_partkey").cast("string")).as("a"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
      .distinct()
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // symmetric edges ⇒ no dangling nodes ⇒ skip the per-iteration
    // node-list left join
    "q_pagerank" -> ((s, dir) =>
      Graph.pageRank(edges(s, dir), Iters, danglingFree = true))
  )

  private val edgesSql =
    """SELECT a AS src, b AS dst FROM
      | (SELECT DISTINCT 'p' || l_partkey AS a, 's' || l_suppkey AS b
      |  FROM lineitem)
      |UNION ALL
      |SELECT b AS src, a AS dst FROM
      | (SELECT DISTINCT 'p' || l_partkey AS a, 's' || l_suppkey AS b
      |  FROM lineitem)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_pagerank" -> Graph.pageRankSql(edgesSql, Iters)
  )
}
