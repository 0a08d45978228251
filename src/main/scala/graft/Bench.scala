package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm every query once AT THE TARGET SCALE FACTOR so the timed
    // pass measures steady-state operator cost, not first-use Janino
    // compilation + JIT (cold vs warm differs 10×+: ~14 s vs ~1 s for
    // the dedup pipelines). Warming at a smaller fixture is NOT
    // enough: join strategies (broadcast vs sort-merge) change with
    // data size, so the small-scale plans compile different generated
    // classes than the ones the timed run executes. The cache is
    // cleared between runs, so data is re-read — only codegen/JIT
    // state carries, which is exactly the steady state a long-lived
    // session has.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").count()
    SparkEntry.entry(spark).count()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    spark.catalog.clearCache()
    // Deterministic order + cache isolation: each query is timed against
    // a cold catalog cache so numbers are per-query, not run-order noise.
    val errors = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
