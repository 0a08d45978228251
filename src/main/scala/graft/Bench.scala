package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registry query at the target scale
  * factor and prints ONE JSON line for the driver.
  *
  * Methodology (this host shows up to 3× run-to-run steal variance, so
  * a single timed rep is not evidence):
  *  - warm every query once AT THE TARGET SCALE FACTOR first, so the
  *    timed passes measure steady-state operator cost, not first-use
  *    Janino compilation + JIT (cold vs warm differs 10×+; warming at
  *    a smaller fixture is NOT enough — join strategies flip
  *    broadcast↔sort-merge with data size, compiling different
  *    generated classes than the timed plans);
  *  - time `SPARK_GRAFT_BENCH_REPS` (default 3) reps per query in
  *    deterministic name order, clearing the catalog cache before
  *    every rep so numbers are per-query, not run-order noise;
  *  - report the per-query MEDIAN in `queries` and persist every
  *    individual rep in `reps`, so a swing can be attributed to host
  *    noise (reps disagree) vs plan cost (reps agree).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").count()
    SparkEntry.entry(spark).count()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    spark.catalog.clearCache()
    val errors = scala.collection.mutable.ListBuffer[String]()
    val names = SparkEntry.queries.keys.toSeq.sorted
    val reps: Map[String, Seq[Double]] = names.map { name =>
      val fn = SparkEntry.queries(name)
      name -> (1 to nReps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          if (!errors.contains(name)) errors += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
    }.toMap
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val medians = reps.map { case (k, v) => k -> median(v) }
    val qs = medians.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val rs = reps.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":[" + v.mkString(",") + "]" }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (medians.nonEmpty) medians.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$rs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
