package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-by-stage timing for the minhash pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.load(spark, dir, "documents")
    val par = spark.sparkContext.defaultParallelism
    import graft.functions.Text
    import graft.operators.Dedup
    val toks = time("tokens") {
      val d = docs.select(col("doc_id"), Text.tokens(col("text")).as("t"))
        .repartition(par).persist(); d.count(); d }
    val sh = time("shingles") {
      val d = toks.select(col("doc_id"),
        array_distinct(Text.shinglesOfTokens(col("t"), 3)).as("sh")).persist()
      d.count(); d }
    val sig = time("signature") {
      val d = sh.withColumn("sig", Dedup.minhashSignature(col("sh"), 64)).persist()
      d.count(); d }
    val bands = time("bands") {
      val d = sig.select(col("doc_id"), col("sh"),
        Dedup.bandHashes(col("sig"), 16, 4).as("bands")).persist()
      d.count(); d }
    val buckets = time("explode+cap") {
      val b = bands.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bhash")))
        .withColumn("bsize", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bhash"))))
        .filter(col("bsize") <= 64).drop("bsize").persist()
      b.count(); b }
    val cands = time("selfjoin+distinct") {
      val c = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct().persist()
      println("cands=" + c.count()); c }
    time("verify jaccard") {
      val shs = bands.select(col("doc_id"), col("sh"))
      val out = cands
        .join(shs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(shs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("j") >= 0.8)
      println("pairs=" + out.count())
    }
    spark.stop()
  }
}
