package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Dev probe: same-process A/B of the graph node-id encoding
  * (`runMain graft.tools.PageRankAB <lineitemDir> [iters]`).
  *
  * The x100 probe tier swings up to ~2.5× run-to-run under host
  * steal, so "is long-keyed pageRank faster than string-keyed?"
  * cannot be answered by comparing two separate probe runs. This
  * runs BOTH encodings back-to-back in one JVM, interleaved
  * (A,B,A,B), so each pair shares the same host window; the paired
  * ratio is the claim, not the absolute seconds. */
object PageRankAB {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    def stringEdges(): DataFrame = {
      val pairs = li.select(
          concat(lit("p"), col("l_partkey").cast("string")).as("a"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("b"))
        .distinct()
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    }
    def longEdges(): DataFrame = {
      val pairs = li.select(
          (col("l_partkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
    }
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[pr-ab] $name ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
    }
    // settle both codegen paths once
    Graph.pageRank(stringEdges(), 1, danglingFree = true).count()
    Graph.pageRank(longEdges(), 1, danglingFree = true).count()
    for (lap <- 1 to 2) {
      spark.catalog.clearCache(); System.gc()
      time(s"lap$lap string")(
        Graph.pageRank(stringEdges(), iters, danglingFree = true).count())
      spark.catalog.clearCache(); System.gc()
      time(s"lap$lap long  ")(
        Graph.pageRank(longEdges(), iters, danglingFree = true).count())
    }
    spark.stop()
  }
}
