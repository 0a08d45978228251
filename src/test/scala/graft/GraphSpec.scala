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

  test("hopDistance: exact BFS distances, bound respected, early exit") {
    import spark.implicits._
    // path a—b—c—d—e plus an isolated pair x—y
    val edges = Seq(("a","b"),("b","c"),("c","d"),("d","e"),("x","y"))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }
      .toDF("src", "dst")
    val src = Seq("a").toDF("node")
    def run(k: Int) = Graph.hopDistance(edges, src, k)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // exact distances; unreachable (x, y) absent
    assert(run(10) == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 4))
    // the hop bound truncates the frontier
    assert(run(2) == Map("a" -> 0, "b" -> 1, "c" -> 2))
    assert(run(0) == Map("a" -> 0))
    // two sources: every node takes its NEAREST source's distance
    val two = Graph.hopDistance(edges, Seq("a", "e").toDF("node"), 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(two == Map("a" -> 0, "e" -> 0, "b" -> 1, "d" -> 1, "c" -> 2))
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

  test("connectedComponents labels each component with its min id") {
    import spark.implicits._
    // components {1,2,3}, {10,11}, direction/dups ignored
    val e = Seq((2L, 1L), (2L, 3L), (3L, 2L), (10L, 11L))
      .toDF("src", "dst")
    val got = Graph.connectedComponents(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("triangleCount: K4 + pendant + dup/reversed/self edges → 4") {
    import spark.implicits._
    // K4 on 1..4 has C(4,3) = 4 triangles; node 5 is pendant (none);
    // duplicates, reversed copies and a self-loop must not change it.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (2L, 1L), (3L, 3L), (1L, 2L)))
      .toDF("src", "dst")
    val got = Graph.triangleCount(edges).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("triangleCount matches brute force on a hashed random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph on 30 nodes
    val edges = (1L to 200L).map { i =>
      ((i * 37) % 30, (i * i * 13 + i) % 30)
    }.filter { case (a, b) => a != b }.toDF("src", "dst")
    val und = edges.collect()
      .map(r => (r.getLong(0) min r.getLong(1), r.getLong(0) max r.getLong(1)))
      .toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      k <- j + 1 until nodes.size
      if und((nodes(i), nodes(j))) && und((nodes(j), nodes(k))) &&
        und((nodes(i), nodes(k)))
    } yield 1).size.toLong
    val got = Graph.triangleCount(edges).collect().head.getLong(0)
    assert(got == brute, s"engine $got vs brute $brute")
  }
}
