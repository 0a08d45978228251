package graft

import org.apache.spark.sql.functions._
import graft.operators.Search
import graft.functions.Text

/** TF-IDF / BM25 goldens on a hand-computable corpus, plus plan-shape
  * checks (term filter before the postings aggregate; broadcast df). */
class SearchSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat"),
      (2L, "cat cat cat"),
      (3L, "dog mat dog mat")
    ).toDF("doc_id", "text")
  }

  test("postings computes tf and dl per (doc, term)") {
    val p = Search.postings(corpus, "doc_id", "text", Some(Seq("cat", "dog")))
      .collect().map(r => (r.getLong(0), r.getString(2)) ->
        (r.getInt(1), r.getLong(3))).toMap
    assert(p((0L, "cat")) == ((6, 1L)))
    assert(p((2L, "cat")) == ((3, 3L)))
    assert(p((1L, "dog")) == ((3, 1L)))
    assert(p((3L, "dog")) == ((4, 2L)))
    assert(p.size == 4)
  }

  test("bm25 matches a hand-rolled computation") {
    val got = Search.bm25(corpus, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=4, df(cat)=2, avgdl = (6+3+3+4)/4 = 4.0
    val idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Long, dl: Long) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 4.0))
    assert(got.keySet == Set(0L, 2L))
    assert(math.abs(got(0L) - s(1, 6)) < 1e-12)
    assert(math.abs(got(2L) - s(3, 3)) < 1e-12)
  }

  test("tfIdf matches the smoothed formula") {
    val got = Search.tfIdf(corpus, "doc_id", "text", Seq("mat"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val w = math.log((1.0 + 4) / (1.0 + 2)) + 1.0
    assert(math.abs(got((0L, "mat")) - 1.0 * w) < 1e-12)
    assert(math.abs(got((3L, "mat")) - 2.0 * w) < 1e-12)
  }

  test("bm25TopK ranks higher-tf docs first and bounds the result") {
    val top = Search.bm25TopK(corpus, "doc_id", "text", Seq("cat"), k = 1)
      .collect()
    assert(top.length == 1)
    assert(top(0).getLong(0) == 2L) // tf=3 in a short doc beats tf=1
  }

  test("postings filters query terms before the aggregate shuffle") {
    val plan = Search.postings(corpus, "doc_id", "text", Some(Seq("cat")))
      .queryExecution.optimizedPlan.toString
    // the isin filter must sit below the Aggregate, not above it
    val aggIdx = plan.indexOf("Aggregate")
    val filterIdx = plan.indexOf("Filter")
    assert(aggIdx >= 0 && filterIdx > aggIdx,
      s"term filter should be below the aggregate:\n$plan")
  }

  test("dupTokenFraction flags repetitious text") {
    import spark.implicits._
    val df = Seq("a a a a", "a b c d").toDF("text")
      .select(Text.dupTokenFraction(Text.tokens(col("text"))).as("f"))
      .collect().map(_.getDouble(0))
    assert(df(0) == 0.75 && df(1) == 0.0)
  }
}
