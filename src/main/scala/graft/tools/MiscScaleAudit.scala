package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the multimodal/profile-family three-point scaling probe
  * (`runMain graft.tools.MiscScaleAudit <out.json> <baseDir>
  * <workDir> <k1,k2,...>`), completing the §8 probe coverage across
  * the remaining registry families.
  *
  * - MULTIMODAL (documents-scaled): per-media decode work must be
  *   strictly linear and blob bytes must never shuffle — the classic
  *   failure is an image pipeline whose re-encode or hash stage
  *   drags payloads through an exchange. q_mm_phash additionally
  *   carries a banding self-join over the hash table whose candidate
  *   volume must track true duplicates (fixed per copy), not pairs.
  * - PROFILE/DRIFT (events/orders-scaled): fused single-scan
  *   aggregates — the summaries are fixed-width (per-column moments,
  *   fixed bin grids), so state must stay constant as rows decuple,
  *   like the streaming sketches.
  *
  * Fixtures are synthesized per scale with [[ScaleUp]] over
  * documents+events+orders into one workDir. Cold timed stages after
  * one settle pass per scale. */
object MiscScaleAudit {


  private val Tables = Set("documents", "events", "orders")

  private val Queries = Seq(
    "q_mm_features",  // decode + residue-class feature sums
    "q_mm_resize",    // decode → pool → re-encode → re-decode
    "q_mm_phash",     // perceptual-hash near-dup (banding + verify)
    "q_mm_frames",    // frame sampling (byte-slice plumbing)
    "q_profile",      // fused per-column profile over events
    "q_chi2",         // chi-square independence over events
    "q_histogram",    // fixed-grid histogram over orders
    "q_drift")        // two-slice drift report over orders

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: MiscScaleAudit <out.json> <baseDir> <workDir> <k1,k2,...>")
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
      // Check EVERY synthesized table, not just one: an interrupted
      // ScaleUp.run can leave a partial fixture dir, and a
      // single-table check would silently time stale/missing tables.
      if (!Tables.forall(t =>
          new java.io.File(s"$dir/$t.parquet/_SUCCESS").exists()))
        ScaleUp.run(spark, baseDir, dir, k, Tables)
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
      println(s"[misc-audit] x$k docs=$m $line")
      val stageJson = stages.map { case (q, sec, n) =>
        s""""$q":{"sec":${Audit.fmt(sec)},"rows":$n}""" }.mkString(",")
      s"""{"label":"x$k","docs_rows":$m,$stageJson}"""
    }
    val json =
      s"""{"metric":"misc_scale","points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
