package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage attribution for the DSIR weight pipeline —
  * times (a) tokenize-only, (b) gram explode, (c) bucket hash,
  * (d) histogram aggregate, (e) full dsirWeights, to locate the
  * dominant kernel at a given fixture dir. */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/textscale/x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Text
    val d = graft.Tables.load(spark, dir, "documents")
    def t(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[dsir-probe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    for (rep <- 1 to 2) {
      t("tokens") {
        // Return the aggregate's own value — an extra d.count() here
        // would add a second full scan to the stage this probe exists
        // to isolate.
        d.select(size(Text.tokens(col("text"))).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      t("grams")(d.select(explode(Text.shinglesOfTokens(
          Text.tokens(col("text")), 2)).as("g")).count())
      t("buckets")(d.select(explode(Text.shinglesOfTokens(
          Text.tokens(col("text")), 2)).as("g"))
        .select(conv(substring(md5(col("g")), 1, 2), 16, 10)
          .cast("int").as("b"))
        .count())
      t("histogram")(d.select(explode(Text.shinglesOfTokens(
          Text.tokens(col("text")), 2)).as("g"))
        .select(conv(substring(md5(col("g")), 1, 2), 16, 10)
          .cast("int").as("b"))
        .groupBy("b").count().collect().length.toLong)
      t("full")(graft.operators.Sampling.dsirWeights(d,
        d.filter(col("source").isin("src1", "src2")), "doc_id", "text")
        .count())
    }
    spark.stop()
  }
}
