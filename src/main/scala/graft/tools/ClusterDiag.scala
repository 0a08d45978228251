package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Throwaway dev diagnostic: decompose q_dedup_cluster's cost into
  * the exact-pair stage vs the connected-components stage.
  * Usage: runMain graft.tools.ClusterDiag [sfDir] [reps] */
object ClusterDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diag] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (i <- 0 until reps) {
      spark.catalog.clearCache()
      println(s"--- rep $i ---")
      val d = graft.Tables.load(spark, dir, "documents")
      val pairs = time("ngramJaccardDedup")(
        Dedup.ngramJaccardDedup(d, "doc_id", "text", k = 3, threshold = 0.8)
          .select(col("id_a"), col("id_b")))
      println(s"pairs=${pairs.count()}")
      val cl = time("nearDupClusters")(
        Dedup.nearDupClusters(d.select(col("doc_id")), pairs, "doc_id"))
      time("cluster count")(println(s"rows=${cl.count()}"))
    }
    spark.stop()
  }
}
