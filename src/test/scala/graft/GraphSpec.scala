package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank: hand-computed golden, mass conservation on symmetric
  * graphs, and partition invariance (the exact-decimal contribution
  * sum is what makes the latter exact, not approximate). */
class GraphSpec extends SparkSpec {

  private def path3 = {
    // undirected path a—b—c as symmetric directed edges
    import spark.implicits._
    Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
  }

  test("pageRank golden on the 3-node path (2 iterations)") {
    // deg a=1,b=2,c=1; r1 = (.575, 1.85, .575);
    // r2 = (.93625, 1.1275, .93625)
    val out = Graph.pageRank(path3, 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 0.93625) < 1e-9)
    assert(math.abs(out("b") - 1.1275) < 1e-9)
    assert(math.abs(out("c") - 0.93625) < 1e-9)
  }

  test("pageRank conserves total mass on symmetric graphs") {
    val total = Graph.pageRank(path3, 5)
      .agg(sum("rank")).collect()(0).getDouble(0)
    assert(math.abs(total - 3.0) < 1e-6)
  }

  test("pageRank output is bit-identical under repartitioning") {
    import spark.implicits._
    val edges = (1L to 400L).flatMap { i =>
      val a = s"n${i % 40}"; val b = s"n${(i * 7) % 40}"
      if (a == b) Nil else Seq((a, b), (b, a))
    }.toDF("src", "dst").distinct()
    def run(parts: Int) =
      Graph.pageRank(edges.repartition(parts), 3)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(run(2) == run(11))
  }
}
