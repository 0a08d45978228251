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

  /** Co-purchase projection: parts sharing an order. The per-order
    * self-join is bounded by order size (TPC-H ≤ 7 lines), so the
    * projection never squares a large group. */
  private def coPurchase(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    li.alias("l").join(li.alias("r"),
        col("l.o") === col("r.o") && col("l.p") < col("r.p"))
      .select(col("l.p").as("src"), col("r.p").as("dst"))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // symmetric edges ⇒ no dangling nodes ⇒ skip the per-iteration
    // node-list left join
    "q_pagerank" -> ((s, dir) =>
      Graph.pageRank(edges(s, dir), Iters, danglingFree = true)),

    // Exact triangle count of the part co-purchase graph —
    // degree-ordered orientation bounds the wedge join at O(m^1.5)
    // regardless of hub skew.
    "q_triangles" -> ((s, dir) =>
      Graph.triangleCount(coPurchase(s, dir))),

    // Weakly connected components of the SPARSE high-quantity
    // order↔part graph (~4% of lineitem): min-label propagation,
    // O(diameter) rounds; oracle = recursive-CTE transitive closure.
    "q_components" -> ((s, dir) => {
      val e0 = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") > 48)
        .select(concat(lit("o"), col("l_orderkey").cast("string")).as("src"),
          concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
        .distinct()
      Graph.connectedComponents(e0)
    }),

    // k-hop contamination spread over the same sparse order↔part
    // graph: sources = parts with partkey % 500 == 0 ("flagged"),
    // BFS out to 6 hops, symmetric edges. Frontier-only shuffles —
    // each round moves the newly-discovered nodes, never the graph.
    // Oracle: bounded recursive CTE (UNION-deduped, so rows are
    // capped at nodes × hops, never path-enumerated) + MIN(dist).
    "q_khop" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 48)
      val e0 = li
        .select(concat(lit("o"), col("l_orderkey").cast("string")).as("src"),
          concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
        .distinct()
      val edges = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val sources = li.filter(col("l_partkey") % 500 === 0)
        .select(concat(lit("p"), col("l_partkey").cast("string")).as("node"))
        .distinct()
      Graph.hopDistance(edges, sources, maxHops = 6)
    })
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
    "q_pagerank" -> Graph.pageRankSql(edgesSql, Iters),

    // Bounded pointer-doubled min-label rounds, NOT a recursive
    // reachability CTE: the closure form is exact but materializes
    // Σ component² rows (hours of DuckDB at sf0.1); this mirror runs
    // the Spark loop's own recurrence 32 rounds.
    "q_components" -> Graph.componentsSql(
      """SELECT a AS src, b AS dst FROM
        | (SELECT DISTINCT 'o' || l_orderkey AS a, 'p' || l_partkey AS b
        |  FROM lineitem WHERE l_quantity > 48)
        |UNION ALL
        |SELECT b AS src, a AS dst FROM
        | (SELECT DISTINCT 'o' || l_orderkey AS a, 'p' || l_partkey AS b
        |  FROM lineitem WHERE l_quantity > 48)""".stripMargin),

    // Bounded-depth BFS as a recursive CTE: UNION (not UNION ALL)
    // dedupes (node, dist) rows per step, so the working set is capped
    // at nodes × (hops+1) — never the path enumeration a closure
    // would do — and MIN(dist) is exactly the frontier BFS's
    // first-discovery distance.
    "q_khop" ->
      """WITH RECURSIVE eb AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM
        |   (SELECT DISTINCT 'o' || l_orderkey AS a, 'p' || l_partkey AS b
        |    FROM lineitem WHERE l_quantity > 48)
        |  UNION ALL
        |  SELECT b AS src, a AS dst FROM
        |   (SELECT DISTINCT 'o' || l_orderkey AS a, 'p' || l_partkey AS b
        |    FROM lineitem WHERE l_quantity > 48)),
        |walk(node, dist) AS (
        |  SELECT DISTINCT 'p' || l_partkey AS node, 0 AS dist
        |  FROM lineitem
        |  WHERE l_quantity > 48 AND l_partkey % 500 = 0
        |  UNION
        |  SELECT e.dst AS node, w.dist + 1 AS dist
        |  FROM walk w JOIN eb e ON e.src = w.node
        |  WHERE w.dist < 6)
        |SELECT node, CAST(MIN(dist) AS INT) AS dist
        |FROM walk GROUP BY node""".stripMargin,

    // Mirror of Graph.triangleCount on the co-purchase projection:
    // same (degree, id) orientation, wedge join, closure semi-join.
    "q_triangles" ->
      """WITH und AS (
        |  SELECT DISTINCT l.l_partkey AS u, r.l_partkey AS v
        |  FROM lineitem l JOIN lineitem r
        |    ON l.l_orderkey = r.l_orderkey AND l.l_partkey < r.l_partkey),
        |deg AS (
        |  SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM (
        |    SELECT u AS n FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY 1),
        |keyed AS (
        |  SELECT und.u, und.v, du.d AS du, dv.d AS dv
        |  FROM und JOIN deg du ON und.u = du.n JOIN deg dv ON und.v = dv.n),
        |orient AS (
        |  SELECT
        |   CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
        |   CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
        |   CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
        |  FROM keyed),
        |wedges AS (
        |  SELECT e1.b AS x, e2.b AS y
        |  FROM orient e1 JOIN orient e2 ON e1.a = e2.a
        |  WHERE e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b))
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM wedges w
        |WHERE EXISTS (SELECT 1 FROM orient e
        |              WHERE e.a = w.x AND e.b = w.y)""".stripMargin
  )
}
