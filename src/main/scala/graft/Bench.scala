package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registry query at the target scale
  * factor and prints ONE JSON line for the driver.
  *
  * Methodology (this host shows up to 3× run-to-run steal variance, so
  * a single timed rep is not evidence):
  *  - per query, in deterministic name order: clear the cache (so no
  *    cross-query cache reuse flatters a number), one untimed settle
  *    rep at the TARGET scale factor (pays Janino compile + JIT —
  *    cold vs warm differs 10×+, and warming at a smaller fixture is
  *    NOT enough: join strategies flip broadcast↔sort-merge with data
  *    size, compiling different generated classes), System.gc() (so
  *    GC debt from earlier queries/compiles isn't billed to rep 1 —
  *    r3's driver run billed a 68 s pause to a query whose
  *    steady-state rep was 2 s), then `SPARK_GRAFT_BENCH_REPS`
  *    (default 3) timed reps back-to-back;
  *  - report the per-query MEDIAN in `queries`; every individual rep
  *    goes to stderr and `bench_reps.json`, so a swing can be
  *    attributed to host noise (reps disagree) vs plan cost (reps
  *    agree). The stdout line stays compact (3-decimal medians, no
  *    inline reps): r3's full-precision inline-reps line outgrew the
  *    driver's tail-capture buffer and failed to parse.
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
    val errors = scala.collection.mutable.ListBuffer[String]()
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val reps: Map[String, Seq[Double]] = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      // Settle rep first (pays Janino compile + JIT at the TARGET SF —
      // warming at a smaller fixture compiles different join-strategy
      // codegen), then GC so the compile garbage isn't billed to rep 1.
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      System.gc()
      name -> (1 to nReps).map { _ =>
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
    def f(v: Double): String = "%.3f".format(v)
    val medians = reps.map { case (k, v) => k -> median(v) }
    val qs = medians.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val rs = reps.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":[" + v.map(f).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (medians.nonEmpty) medians.values.sum else 0.0
    val repsJson =
      s"""{"reps":$rs,"nreps":$nReps,"errors":$errs,"sf":"$sfDir"}"""
    System.err.println(s"[bench-reps] $repsJson")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_reps.json"),
      repsJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] reps file write failed: ${e.getMessage}") }
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
