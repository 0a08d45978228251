package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Similarity}

/** Throwaway dev diagnostic: decompose the table-path kNN constant
  * (`runMain graft.tools.TableKnnDiag <dir>`). */
object TableKnnDiag {
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
      println(f"[diag] $name ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    val tab = time("build")(
      Similarity.buildHierIvfTableIndex(e, "vec_id", "embedding"))
    time("saltStats")(tab.saltStats)
    // warm lap
    Similarity.knnJoinHierTable(tab, e, "vec_id", "embedding",
      k = 10, nprobe = 4, nsp = 4).count()
    // 0a. physical plans — is the InMemoryRelation actually used?
    println("== cells plan ==")
    println(tab.cells.queryExecution.executedPlan.toString.take(3000))
    println("== assigned count plan ==")
    println(tab.assigned.groupBy().count()
      .queryExecution.executedPlan.toString.take(3000))
    // 0. are the index frames actually cache-hitting?
    time("cells count lap1")(println(tab.cells.count()))
    time("cells count lap2")(println(tab.cells.count()))
    time("cells force")(println(Audit.force(tab.cells)))
    time("assigned count lap1")(println(tab.assigned.count()))
    time("assigned force")(println(Audit.force(tab.assigned)))
    println("cells storage=" + tab.cells.storageLevel +
      " assigned storage=" + tab.assigned.storageLevel)
    // 1. qsup alone (explode probeCells literal)
    val qsup = e
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("sup", explode(graft.functions.VectorFunctions
        .probeCells(col("qv"), tab.superMatrix, 4)))
    time("qsup count")(println(qsup.count()))
    // 2. qsup join cells, no cosine
    val joined = qsup.join(tab.cells, Seq("sup"))
    time("qsup x cells count")(println(joined.count()))
    // 3. + cosine projection forced
    time("+ ccos forced")(println(Audit.force(joined
      .select(col("query_id"), Dedup.cosine(col("qv"), col("centroid"))
        .as("ccos")))))
    // 4. full pick
    val picked = Similarity.hierTablePick(tab, e, "vec_id", "embedding", 4, 4)
    time("full pick")(println(picked.count()))
    val pickedC = picked
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pick persist")(pickedC.count())
    // 5. candidate join from persisted probes (no salt)
    val scored = tab.assigned.join(pickedC, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Dedup.cosine(col("qv"), col("cv")).as("cos"))
    time("scored count (from cached probes)")(println(scored.count()))
    time("topk (from cached probes)")(
      println(Similarity.topKByGroup(scored, 10).count()))
    // 6. second lap of the full thing (warm)
    time("full knnJoinHierTable lap2")(
      println(Similarity.knnJoinHierTable(tab, e, "vec_id", "embedding",
        k = 10, nprobe = 4, nsp = 4).count()))
    spark.stop()
  }
}
