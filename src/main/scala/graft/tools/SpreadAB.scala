package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Paired interleaved A/B for the [[graft.operators.Frames.spread]]
  * change (dev tool): runs a dedup operator body twice per lap on the
  * same many-split corpus —
  *   A: input pre-repartitioned round-robin to defaultParallelism
  *      (spread then sees >= par partitions and is a no-op, so the
  *      plan contains exactly the one RR exchange the OLD unconditional
  *      `repartition(par)` code produced), and
  *   B: input as scanned (spread skips — the NEW plan, no RR exchange).
  * Same JVM, alternating order per lap, so host drift and JVM state
  * cancel in the per-lap ratio — the PageRankAB discipline.
  * Usage: runMain graft.tools.SpreadAB <docsDir> <op> [laps]
  *   op ∈ minhash | spans | winnow
  */
object SpreadAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val op = if (args.length > 1) args(1) else "minhash"
    val laps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[spread-ab] scan partitions=${docs.rdd.getNumPartitions} par=$par")
    def body(df: org.apache.spark.sql.DataFrame): Long = op match {
      case "minhash" => Audit.force(
        graft.operators.Dedup.minhashDedup(df, "doc_id", "text",
          threshold = 0.8))
      case "spans" => Audit.force(
        graft.operators.Dedup.dupSpanStats(df, "doc_id", "text", k = 8))
      case "winnow" => Audit.force(
        graft.operators.Dedup.winnowNearDup(df, "doc_id", "text",
          n = 24, w = 8, maxBucket = 96))
      case other => sys.error(s"unknown op $other")
    }
    def time(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime(); val n = body(df)
      ((System.nanoTime() - t0) / 1e9, n)
    }
    body(docs) // settle: warm codegen + page cache
    for (lap <- 1 to laps) {
      spark.catalog.clearCache()
      val aFirst = lap % 2 == 1
      val (ta, na) = if (aFirst) time(docs.repartition(par)) else (0.0, 0L)
      val (tb, nb) = time(docs)
      val (ta2, na2) = if (!aFirst) time(docs.repartition(par)) else (ta, na)
      val (fa, fb) = (if (aFirst) ta else ta2, tb)
      println(f"[spread-ab $op lap$lap] A(old,RR)=$fa%.2fs B(new,skip)=$fb%.2fs " +
        f"ratio=${fb / fa}%.2f rowsA=${if (aFirst) na else na2} rowsB=$nb")
    }
    spark.stop()
  }
}
