package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.GraphQueries

/** Dev tool: the graph-family three-point scaling probe
  * (`runMain graft.tools.GraphScaleAudit <out.json> <baseDir>
  * <workDir> <k1,k2,...>` — e.g. `1,10,100` from sf0.1).
  *
  * Same instrument as [[AnnScaleAudit]]/[[DedupScaleAudit]], pointed
  * at the iterative-graph family — the other place super-linearities
  * classically hide (a wedge join that forgets its degree ordering is
  * O(m²) on hubs; a components loop whose rounds grow with the corpus
  * multiplies everything by log n).
  *
  * Corpus synthesis is just [[ScaleUp]] restricted to lineitem (the
  * only table the graph queries read): copy keys shift by 10⁸, so the
  * scaled corpus is k DISJOINT copies of the base graph — node count,
  * edge count, triangle count, and component count all exactly k×,
  * diameter unchanged. Linear true structure means wall-time ratios
  * read as algorithm curvature, not output growth. The probe runs the
  * REGISTRY BODIES themselves (q_pagerank / q_components /
  * q_triangles / q_khop), so what is measured is exactly what ships.
  * Each scale: one untimed settle pass (codegen/JIT/AQE warm at that
  * scale), then the timed pass with per-query output counts. */
object GraphScaleAudit {

  private def f(v: Double): String = Audit.fmt(v)

  private val Queries = Seq("q_pagerank", "q_components", "q_triangles",
    "q_khop")

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: GraphScaleAudit <out.json> <baseDir> <workDir> <k1,k2,...>")
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
      if (!new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists())
        ScaleUp.run(spark, baseDir, dir, k, Set("lineitem"))
      val m = spark.read.parquet(s"$dir/lineitem.parquet").count()
      Queries.foreach(q => Audit.force(GraphQueries.queries(q)(spark, dir)))
      // Cold timed stages (clearCache): intermediate frames from the
      // settle pass must not be plan-matched into the timed pass
      // (pageRank itself now leaves zero CacheManager entries, but
      // the other bodies persist intermediates). Audit.force, not
      // bare count(), so the decode/round output projections stay in
      // the measured plan.
      val stages = Queries.map { q =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = Audit.force(GraphQueries.queries(q)(spark, dir))
        ((q, (System.nanoTime() - t0) / 1e9, n))
      }
      val line = stages.map { case (q, sec, n) => s"$q=${f(sec)}s/$n" }
        .mkString(" ")
      println(s"[graph-audit] x$k lineitem=$m $line")
      val stageJson = stages.map { case (q, sec, n) =>
        s""""$q":{"sec":${f(sec)},"rows":$n}""" }.mkString(",")
      s"""{"label":"x$k","lineitem_rows":$m,$stageJson}"""
    }
    val json =
      s"""{"metric":"graph_scale","points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
