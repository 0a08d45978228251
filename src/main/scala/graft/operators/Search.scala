package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Full-text relevance scoring over a document corpus — TF-IDF and
  * BM25 on an inverted-index plan shape. Beyond-reference surface (the
  * reference has no string processing, SURVEY §1.4); this is the
  * retrieval half of a training-data pipeline (quality-weighted corpus
  * search, dedup-adjacent "find documents like this query").
  *
  * Scale shape (the part that must survive 100 TB):
  *  - postings are (term, doc, tf) produced by explode+groupBy — one
  *    shuffle keyed (doc, term); for a FIXED query the term filter is
  *    applied BEFORE that shuffle, so only postings of query terms
  *    (a vanishing fraction of the corpus) ever move;
  *  - per-term document frequencies for the query terms are a
  *    few-row aggregate, broadcast back — never a full-vocabulary
  *    join;
  *  - corpus stats (N, avg doc length) are a single 1-row aggregate
  *    cross-joined in broadcast form;
  *  - top-k is TakeOrderedAndProject (per-partition bounded heaps,
  *    O(k) per partition to the driver merge — no global sort).
  */
object Search {

  /** Postings list for the corpus: (term, doc id, tf, dl) with dl the
    * document's token count. `terms` (if set) restricts to those terms
    * BEFORE the aggregate — the only shape a fixed-query scorer should
    * use. */
  def postings(docs: DataFrame, id: String, text: String,
               terms: Option[Seq[String]] = None): DataFrame = {
    val toks = docs.select(col(id), Text.tokens(col(text)).as("__toks"))
      .select(col(id), size(col("__toks")).as("dl"),
        explode(col("__toks")).as("term"))
    val filtered = terms.fold(toks)(ts =>
      toks.filter(col("term").isin(ts.map(lit(_)): _*)))
    filtered.groupBy(col(id), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** 1-row corpus stats (n_docs, avgdl). avgdl is the exact integer
    * token-count sum divided once in double — summation-order-free, so
    * identical bits in any engine (a double `avg` would depend on
    * partition association). */
  private def corpusStats(docs: DataFrame, text: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      (sum(Text.tokenCount(col(text)).cast("long")).cast("double") /
        count(lit(1))).as("avgdl"))

  /** Smoothed TF-IDF weights for `terms`, per (doc, term):
    * tf · (ln((1+N)/(1+df)) + 1). Returns (id, term, tfidf). */
  def tfIdf(docs: DataFrame, id: String, text: String,
            terms: Seq[String]): DataFrame = {
    val p = postings(docs, id, text, Some(terms))
    val df = p.groupBy("term").agg(count(lit(1)).as("df"))
    p.join(broadcast(df), "term")
      .crossJoin(broadcast(corpusStats(docs, text)))
      .select(col(id), col("term"),
        (col("tf").cast("double") *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) +
            lit(1.0))).as("tfidf"))
  }

  /** BM25 relevance of every document containing at least one query
    * term: Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with
    * the Robertson idf ln(1 + (N−df+0.5)/(df+0.5)). Returns
    * (id, score); docs matching no term are absent (score 0). */
  def bm25(docs: DataFrame, id: String, text: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val p = postings(docs, id, text, Some(terms))
    val df = p.groupBy("term").agg(count(lit(1)).as("df"))
    p.join(broadcast(df), "term")
      .crossJoin(broadcast(corpusStats(docs, text)))
      .select(col(id),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / col("avgdl")))).as("__s"))
      .groupBy(col(id))
      // exact-decimal cross-term sum: per-term scores are deterministic
      // doubles (IEEE ops + one ln), so the only nondeterminism a plain
      // double sum would add is partition-order association — the
      // decimal sum removes it and keeps the oracle compare exact
      .agg(sum(col("__s").cast("decimal(27,18)")).cast("double").as("score"))
  }

  /** Top-k BM25 hits, ranked on the 6-decimal-rounded score with doc id
    * as the tie-break (rounding makes the cut deterministic across
    * engines — raw doubles differ in the last ulp between libm
    * implementations, and an unrounded boundary would flap). */
  def bm25TopK(docs: DataFrame, id: String, text: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25(docs, id, text, terms, k1, b)
      .select(col(id), round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
}
