package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.StreamTextQueries

/** Dev tool: the streaming/stateful-family three-point scaling probe
  * (`runMain graft.tools.StreamScaleAudit <out.json> <baseDir>
  * <workDir> <k1,k2,...>` — e.g. `1,10,100` from sf0.1).
  *
  * Same instrument as the other family audits, pointed at the
  * stateful operators (sessionization, event-time windows, and the
  * mapGroupsWithState/flatMapGroupsWithState kernels run in batch
  * mode — the same code paths Structured Streaming executes per
  * micro-batch). The family's classic super-linearity risks: state
  * that grows with the corpus instead of the group count (HLL/CMS/MG
  * summaries are fixed-size per group BY DESIGN — this probe pins
  * it), and a groups-sort whose cost curves worse than n·log n as
  * groups multiply.
  *
  * Corpus synthesis is [[ScaleUp]] restricted to `events`: copy keys
  * shift event_id/user_id by 10⁸ per copy, so users — hence session
  * groups, first-seen groups, and per-type distinct-user
  * cardinalities — grow exactly k×, while event_type (a fixed enum)
  * and the time range stay put: the per-type sketch state must stay
  * CONSTANT as its input decuples, which is precisely the property
  * worth measuring. Outputs: q_sessionize/q_first_seen exactly k×
  * rows; q_window_agg/q_hll_stream/q_cms_stream/q_heavy_hitters
  * fixed row counts with k×-fed values. Cold timed stages after one
  * settle pass per scale (clearCache — the CacheManager
  * plan-matching lesson). */
object StreamScaleAudit {

  private def f(v: Double): String = Audit.fmt(v)

  private val Queries = Seq("q_sessionize", "q_window_agg",
    "q_window_sliding", "q_first_seen", "q_hll_stream", "q_cms_stream",
    "q_heavy_hitters")

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: StreamScaleAudit <out.json> <baseDir> <workDir> <k1,k2,...>")
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
      if (!new java.io.File(s"$dir/events.parquet/_SUCCESS").exists())
        ScaleUp.run(spark, baseDir, dir, k, Set("events"))
      val m = spark.read.parquet(s"$dir/events.parquet").count()
      // Audit.force, NOT bare count(): count() lets Catalyst prune
      // unreferenced output expressions (the window-agg projections
      // here; the mapGroupsWithState queries are opaque either way).
      Queries.foreach(q =>
        Audit.force(StreamTextQueries.queries(q)(spark, dir)))
      val stages = Queries.map { q =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = Audit.force(StreamTextQueries.queries(q)(spark, dir))
        ((q, (System.nanoTime() - t0) / 1e9, n))
      }
      val line = stages.map { case (q, sec, n) => s"$q=${f(sec)}s/$n" }
        .mkString(" ")
      println(s"[stream-audit] x$k events=$m $line")
      val stageJson = stages.map { case (q, sec, n) =>
        s""""$q":{"sec":${f(sec)},"rows":$n}""" }.mkString(",")
      s"""{"label":"x$k","events_rows":$m,$stageJson}"""
    }
    val json =
      s"""{"metric":"stream_scale","points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
