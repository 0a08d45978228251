package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the sampling/mixing/layout-family three-point scaling
  * probe (`runMain graft.tools.SampleScaleAudit <out.json> <baseDir>
  * <workDir> <k1,k2,...>` — e.g. `1,10,100` from sf0.1; shares the
  * documents-only [[ScaleUp]] fixtures with [[TextScaleAudit]]).
  *
  * The family's classic super-linearity risks: a "sample" that
  * globally sorts the corpus to take its cut (the weighted-sample and
  * token-budget shapes are the tempting offenders — both must stay
  * bounded-heap / prefix-sum), per-group reservoirs whose state grows
  * with the GROUP instead of k, and a shard assigner that funnels
  * through one task to number rows. All gates must stay scan-stage
  * hash arithmetic: linear passes, fixed-size state, output driven by
  * the requested sample size — not the corpus.
  *
  * Under ScaleUp's k-identical-copies corpus the expected outputs:
  * rate-gated samples (q_sample, q_mix, q_dsir, q_split_safe) grow
  * ~k× rows; fixed-size cuts (q_reservoir, q_weighted_sample,
  * q_token_budget, q_shards) keep constant row counts with k×-fed
  * inputs. Cold timed stages after one settle pass per scale. */
object SampleScaleAudit {


  private val Queries = Seq(
    "q_sample",          // deterministic hash-gate sample (scan-stage)
    "q_mix",             // stratified per-language rates
    "q_dsir",            // importance-resampling gate
    "q_split_safe",      // leakage-safe dup-group-keyed split
    "q_reservoir",       // per-group bounded reservoir
    "q_weighted_sample", // weighted order sample (bounded heap)
    "q_token_budget",    // greedy token-budget prefix cut (exscan)
    "q_shards")          // balanced shard assignment (exscan)

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: SampleScaleAudit <out.json> <baseDir> <workDir> <k1,k2,...>")
    val Array(out, baseDir, workDir, ksStr) = args
    val ks = ksStr.split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = ks.map { k =>
      val dir = s"$workDir/x$k"
      // _SUCCESS, not bare dir existence: an interrupted ScaleUp
      // leaves a partial dir this would otherwise silently accept.
      if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists())
        ScaleUp.run(spark, baseDir, dir, k, Set("documents"))
      val m = spark.read.parquet(s"$dir/documents.parquet").count()
      Queries.foreach(q => Audit.force(graft.SparkEntry.queries(q)(spark, dir)))
      val stages = Queries.map { q =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = Audit.force(graft.SparkEntry.queries(q)(spark, dir))
        ((q, (System.nanoTime() - t0) / 1e9, n))
      }
      val line = stages.map { case (q, sec, n) => s"$q=${Audit.fmt(sec)}s/$n" }
        .mkString(" ")
      println(s"[sample-audit] x$k docs=$m $line")
      val stageJson = stages.map { case (q, sec, n) =>
        s""""$q":{"sec":${Audit.fmt(sec)},"rows":$n}""" }.mkString(",")
      s"""{"label":"x$k","docs_rows":$m,$stageJson}"""
    }
    val json =
      s"""{"metric":"sample_scale","points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
