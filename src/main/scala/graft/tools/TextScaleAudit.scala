package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the text/LM-family three-point scaling probe
  * (`runMain graft.tools.TextScaleAudit <out.json> <baseDir>
  * <workDir> <k1,k2,...>` — e.g. `1,10,100` from sf0.1).
  *
  * Same instrument as the other family audits (SURVEY §8.4–§8.8),
  * pointed at the text-analysis / retrieval / tokenization operators.
  * The family's classic super-linearity risks: a term-keyed join that
  * moves the FULL postings list instead of the query terms' slice
  * (stopword-hot terms concentrate like duplicate-dense ANN cells), a
  * vocabulary aggregate whose state grows with the corpus rather than
  * the vocab, a global sort hiding in a top-k, and a packing/prefix
  * sum whose sequential dependency serializes.
  *
  * Corpus synthesis is [[ScaleUp]] restricted to `documents`: copy
  * keys shift doc_id by 10⁸ per copy, so the corpus is k identical
  * content copies under distinct ids — term df and corpus N grow
  * exactly k× while the vocabulary (and every per-term model) stays
  * fixed, which is precisely the state-must-stay-constant property
  * worth measuring for vocab/LM/retrieval operators. Outputs:
  * per-document queries grow exactly k× rows; vocab/LM/top-k queries
  * keep fixed row counts with k×-fed values. Cold timed stages after
  * one settle pass per scale (clearCache — the CacheManager
  * plan-matching lesson). */
object TextScaleAudit {


  private val Queries = Seq(
    "q_text_stats",    // scan-stage token/length stats (flat per row)
    "q_lang_id",       // stopword-hit argmax (flat per row)
    "q_fingerprint",   // rolling-hash document fingerprint (flat)
    "q_vocab",         // explode → (term) agg + exact df + top-50
    "q_tfidf",         // term-filtered postings + broadcast df join
    "q_bm25_topk",     // BM25 + TakeOrdered top-k
    "q_ngram_lm",      // vocab-bounded bigram LM
    "q_perplexity",    // LM scoring pass over every document
    "q_bpe_encode",    // chained scan-stage merge kernels
    "q_chunk",         // sliding token windows (explode; k× output)
    "q_pack")          // exscan prefix sum + per-row bin arithmetic

  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: TextScaleAudit <out.json> <baseDir> <workDir> <k1,k2,...>")
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
      println(s"[text-audit] x$k docs=$m $line")
      val stageJson = stages.map { case (q, sec, n) =>
        s""""$q":{"sec":${Audit.fmt(sec)},"rows":$n}""" }.mkString(",")
      s"""{"label":"x$k","docs_rows":$m,$stageJson}"""
    }
    val json =
      s"""{"metric":"text_scale","points":[${rows.mkString(",")}]}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
