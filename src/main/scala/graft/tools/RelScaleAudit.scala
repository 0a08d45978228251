package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.{MLQueries, RelationalQueries}

/** Dev tool: the relational/ML-family three-point scaling probe
  * (`runMain graft.tools.RelScaleAudit <out.json> <baseDir>
  * <workDir> <k1,k2,...>` — e.g. `1,10,100` from sf0.1).
  *
  * Same instrument as [[AnnScaleAudit]]/[[DedupScaleAudit]]/
  * [[GraphScaleAudit]], pointed at the core relational path — the
  * TPC-H-shape scans, joins, and aggregates that carry most of a
  * 100 TB batch workload. These plans are Catalyst-native (exchange
  * on join/group keys, partial aggregation, broadcast dims), so the
  * EXPECTED curve is linear scan work over a flat stage structure;
  * the probe exists to catch the ways that expectation silently
  * breaks: a forced-broadcast side that grows with the corpus
  * (q26's part broadcast, q3's filtered customer broadcast), an
  * aggregate whose group count explodes from collapsed to
  * corpus-proportional (q05/q26 group by orderkey), or a sort whose
  * spill behavior degrades super-linearly (q3's top-10 is bounded —
  * TakeOrdered — precisely so that it cannot).
  *
  * Corpus synthesis is [[ScaleUp]] over the four tables this family
  * reads (lineitem/orders/customer/part): copy keys shift by 10⁸,
  * so the scaled corpus is k disjoint copies with identical join
  * selectivity and fan-out — join output and per-orderkey group
  * counts exactly k×, while the global-agg queries (q1/q6/ols)
  * keep constant output over k× input. The probe runs the REGISTRY
  * BODIES themselves. Each scale: one untimed settle pass
  * (codegen/JIT/AQE warm), then cold timed stages (clearCache — the
  * [[DedupScaleAudit]] lesson about CacheManager plan-matching). */
object RelScaleAudit {

  private def f(v: Double): String = Audit.fmt(v)

  // nation is a fixed dim (q05's broadcast side) — ScaleUp copies it
  // unshifted; the other four scale k×.
  private val Tables =
    Set("lineitem", "orders", "customer", "part", "nation")

  private val Queries: Seq[(String, (SparkSession, String) =>
      org.apache.spark.sql.DataFrame)] = Seq(
    "q1_agg" -> RelationalQueries.queries("q1_agg"),
    "q_tpch_q6" -> RelationalQueries.queries("q_tpch_q6"),
    "q_tpch_q3" -> RelationalQueries.queries("q_tpch_q3"),
    "q05_shape" -> RelationalQueries.queries("q05_shape"),
    "q26_shape" -> RelationalQueries.queries("q26_shape"),
    "q_ml_ols" -> MLQueries.queries("q_ml_ols"))

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: RelScaleAudit <out.json> <baseDir> <workDir> <k1,k2,...>")
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
      // Check EVERY synthesized table's _SUCCESS, not one dir's bare
      // existence: an interrupted ScaleUp.run leaves partial fixture
      // dirs a single-table check would silently accept (timing
      // stale/missing tables) — the MiscScaleAudit lesson.
      if (!Tables.forall(t =>
          new java.io.File(s"$dir/$t.parquet/_SUCCESS").exists()))
        ScaleUp.run(spark, baseDir, dir, k, Tables)
      val m = spark.read.parquet(s"$dir/lineitem.parquet").count()
      // Audit.force, NOT bare count(): under count() Catalyst prunes
      // unreferenced aggregate/projection expressions (q1_agg's
      // sum/avg arithmetic would drop out of the measured plan).
      Queries.foreach { case (_, q) => Audit.force(q(spark, dir)) }
      val stages = Queries.map { case (name, q) =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = Audit.force(q(spark, dir))
        ((name, (System.nanoTime() - t0) / 1e9, n))
      }
      val line = stages.map { case (q, sec, n) => s"$q=${f(sec)}s/$n" }
        .mkString(" ")
      println(s"[rel-audit] x$k lineitem=$m $line")
      val stageJson = stages.map { case (q, sec, n) =>
        s""""$q":{"sec":${f(sec)},"rows":$n}""" }.mkString(",")
      s"""{"label":"x$k","lineitem_rows":$m,$stageJson}"""
    }
    val json =
      s"""{"metric":"rel_scale","points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
