package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev tool: the near-dup-family three-point scaling probe
  * (`runMain graft.tools.DedupScaleAudit <out.json> <baseDocsDir>
  * <workDir> <k1,k2,...>` — e.g. `1,10,100` from the 5k-doc sf0.1
  * fixture = 5k/50k/500k documents).
  *
  * Same instrument as [[AnnScaleAudit]]: three corpus sizes an order of
  * magnitude apart make curvature visible where the two-point §8.3
  * audit cannot distinguish linear from quadratic (that gap hid the
  * r5 IVF-build quadratic). This probe points it at the OTHER big
  * scale-critical family: MinHash/SimHash/winnowing near-dup,
  * duplicated-span stats, and pair→component clustering.
  *
  * Corpus synthesis — deliberately the FRIENDLY shape, unlike the ANN
  * probe's 100×-duplicated stress fixture: copy 0 is the base corpus
  * verbatim; each copy i ≥ 1 shifts ids by i·10⁸ and salts EVERY token
  * with a copy tag (`w → w⸚i`), so cross-copy shingle/fingerprint
  * overlap is zero and the TRUE near-dup pair set replicates exactly
  * per copy. True pairs therefore grow LINEARLY with k, which is what
  * makes wall-time ratios readable as algorithm curvature rather than
  * output growth (the q_dedup_embed lesson: a quadratic OUTPUT makes
  * any runtime ratio meaningless as a plan signal). Clustering runs on
  * the minhash pair stream — the sketch-based linear path a 100 TB
  * corpus would use — not the exact ngram path, whose size-blocked
  * all-pairs contract is priced quadratic-in-block by design.
  *
  * Each scale runs one untimed settle pass (codegen/JIT warm at that
  * scale — join strategies flip with data size), then the timed pass;
  * per-stage OUTPUT counts are recorded so any super-linear step can
  * be checked against its output first. */
object DedupScaleAudit {

  private def f(v: Double): String = Audit.fmt(v)

  /** Copy i of the base docs: ids shifted by i·10⁸; for i ≥ 1 every
    * token (\S+ run) carries a copy suffix, making cross-copy shingle
    * sets disjoint while within-copy structure is byte-for-byte the
    * base corpus's. The suffix character is from a non-token alphabet
    * so it cannot merge adjacent tokens under any tokenizer. */
  private def copyOf(base: DataFrame, i: Int): DataFrame =
    if (i == 0) base
    else base
      .withColumn("doc_id", col("doc_id") + lit(i.toLong * 100000000L))
      .withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1⸚" + i))

  def scaled(spark: SparkSession, baseDir: String, workDir: String,
             k: Int): String = {
    val dst = s"$workDir/x$k/documents.parquet"
    // _SUCCESS, not bare dir existence: an interrupted write leaves a
    // partial dir this would otherwise silently accept.
    if (!new java.io.File(s"$dst/_SUCCESS").exists()) {
      val base = spark.read.parquet(s"$baseDir/documents.parquet")
      (0 until k).map(copyOf(base, _)).reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(dst)
    }
    dst
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: DedupScaleAudit <out.json> <baseDocsDir> <workDir> <k1,k2,...>")
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

    def body(d: DataFrame): Seq[(String, () => Long)] = Seq(
      "minhash" -> (() =>
        Dedup.minhashDedup(d, "doc_id", "text", k = 3, threshold = 0.8)
          .count()),
      "simhash" -> (() =>
        Dedup.simhashDedup(d, "doc_id", "text", maxHamming = 3).count()),
      "winnow" -> (() =>
        Dedup.winnowNearDup(d, "doc_id", "text", n = 24, w = 8,
          minShared = 2).count()),
      "spans" -> (() =>
        Dedup.dupSpanStats(d, "doc_id", "text", k = 8).count()),
      "cluster" -> (() =>
        Dedup.nearDupClusters(d.select(col("doc_id")),
          Dedup.minhashDedup(d, "doc_id", "text", k = 3, threshold = 0.8)
            .select(col("id_a"), col("id_b")),
          "doc_id")
          .filter(col("cluster") =!= col("doc_id")).count()))

    val rows = ks.map { k =>
      val dir = scaled(spark, baseDir, workDir, k)
      val d = spark.read.parquet(dir).select(col("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = d.count()
      body(d).foreach { case (_, run) => run() } // settle: warm at scale
      // The dedup operators persist their outputs (and some stage
      // tables) internally; Spark's CacheManager plan-matches a
      // re-built identical pipeline onto those InMemoryRelations, so
      // without this the timed pass reads the settle pass's caches and
      // measures a table scan, not the operator. Drop EVERYTHING
      // between stages and re-pin only the input.
      def cold(): Unit = {
        spark.catalog.clearCache()
        d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count()
        System.gc()
      }
      val stages = body(d).map { case (name, run) =>
        cold()
        val t0 = System.nanoTime()
        val rowsOut = run()
        val sec = (System.nanoTime() - t0) / 1e9
        (name, sec, rowsOut)
      }
      d.unpersist(false)
      val line = stages.map { case (nm, sec, r) => s"$nm=${f(sec)}s/$r" }
        .mkString(" ")
      println(s"[dedup-audit] x$k n=$n $line")
      val stageJson = stages.map { case (nm, sec, r) =>
        s""""$nm":{"sec":${f(sec)},"rows":$r}""" }.mkString(",")
      s"""{"label":"x$k","n":$n,$stageJson}"""
    }
    val json =
      s"""{"metric":"dedup_scale","points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
