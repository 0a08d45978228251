package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe: stage-level timing of the table-state kNN join at one
  * corpus (`runMain graft.tools.AnnTableProbe <dir>`), to attribute
  * the salted-join cost the [[AnnScaleAudit]] measures. */
object AnnTableProbe {
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
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"n=${e.count()}")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(s"[ann-table-probe] $name ${f((System.nanoTime() - t0) / 1e9)}s")
      r
    }
    val tab = Similarity.buildHierIvfTableIndex(e, "vec_id", "embedding")
    tab.assigned.count()
    // warm
    Similarity.knnJoinHierTable(tab, e, "vec_id", "embedding",
      k = 10, nprobe = 4, nsp = 4).count()
    tab.release()
    spark.catalog.clearCache()
    e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    val tab2 = Similarity.buildHierIvfTableIndex(e, "vec_id", "embedding")
    tab2.assigned.count()
    // cell-size stats
    val sizes = tab2.assigned.groupBy(col("cell")).count()
      .collect().map(_.getLong(1)).sorted
    println(s"cells=${sizes.length} max=${sizes.last} " +
      s"p50=${sizes(sizes.length / 2)} over256=${sizes.count(_ > 256)}")
    time("pick (probes only)") {
      println("probes=" + Similarity.hierTablePick(tab2, e,
        "vec_id", "embedding", nprobe = 4, nsp = 4).count())
    }
    time("salted scored join + topk (full)") {
      println("rows=" + Similarity.knnJoinHierTable(tab2, e,
        "vec_id", "embedding", k = 10, nprobe = 4, nsp = 4).count())
    }
    time("UNSALTED scored join + topk (skew-exposed reference)") {
      val picked = Similarity.hierTablePick(tab2, e,
        "vec_id", "embedding", nprobe = 4, nsp = 4)
      val scored = tab2.assigned.join(picked, Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          graft.operators.Dedup.cosine(col("qv"), col("cv")).as("cos"))
      println("rows=" + Similarity.topKByGroup(scored, 10).count())
    }
    tab2.release()
    spark.stop()
  }
}
