package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: verified-winnow pair set vs the oracle-matched exact
  * Jaccard pair set (q_dedup_ngram dump). */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ngramDump = args.lift(1).getOrElse("/tmp/graft_verify_sf01/q_dedup_ngram")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val win = graft.operators.Dedup.winnowNearDup(docs, "doc_id", "text",
      n = 24, w = 8, minShared = 2).select("id_a", "id_b")
    val exact = spark.read.parquet(ngramDump).select("id_a", "id_b")
    println("winnow=" + win.count() + " exact=" + exact.count() +
      " diff=" + win.exceptAll(exact).count() +
      "/" + exact.exceptAll(win).count())
    spark.stop()
  }
}
