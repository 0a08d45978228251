package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe: stage-level timing of the winnowing near-dup pipeline at
  * one corpus (`runMain graft.tools.WinnowProbe <docsDir>`), to
  * attribute the super-linearity the [[DedupScaleAudit]] measures to a
  * stage before fixing it. */
object WinnowProbe {
  private def f(v: Double): String = Audit.fmt(v)

  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs=${d.count()}")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(s"[winnow-probe] $name ${f((System.nanoTime() - t0) / 1e9)}s")
      r
    }
    time("fingerprints") {
      println("fps=" + Dedup.winnowFingerprints(d, "doc_id", "text",
        n = 24, w = 8).count())
    }
    time("dedup(cands)") {
      println("cands=" + Dedup.winnowDedup(d, "doc_id", "text",
        n = 24, w = 8, minShared = 2).count())
    }
    time("nearDup(full)") {
      println("pairs=" + Dedup.winnowNearDup(d, "doc_id", "text",
        n = 24, w = 8, minShared = 2).count())
    }
    spark.stop()
  }
}
