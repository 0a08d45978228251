package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE merge learning: hand-computed goldens (the classic weighted-
  * vocabulary walk), greedy non-overlap semantics, determinism. */
class BpeSpec extends SparkSpec {

  test("mergePair is greedy left-to-right and non-overlapping") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "a", "a")), Tuple1(Seq("a", "a", "a", "a")),
      Tuple1(Seq("b", "a", "a")))
      .toDF("sym")
    val out = df.select(Bpe.mergePair(col("sym"), "a", "a"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out.toList == List(
      List("aa", "a"), List("aa", "aa"), List("b", "aa")))
  }

  test("native merge kernel equals the HOF fold on random symbol runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      Tuple1((1 to rnd.nextInt(12)).map(_ =>
        Seq("a", "b", "ab", "c")(rnd.nextInt(4))))
    }
    val df = rows.toDF("sym")
    for ((a, b) <- Seq(("a", "b"), ("a", "a"), ("ab", "c"), ("a", "ab"))) {
      val both = df.select(
        Bpe.mergePair(col("sym"), a, b).as("native"),
        Bpe.mergePairHof(col("sym"), a, b).as("hof"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"pair ($a,$b)")
      }
    }
  }

  test("graft_merge_pair is callable from SQL") {
    import spark.implicits._
    Seq(Tuple1(Seq("l", "o", "w"))).toDF("sym")
      .createOrReplaceTempView("bpe_in")
    val out = spark.sql("SELECT graft_merge_pair(sym, 'l', 'o') FROM bpe_in")
      .collect()(0).getSeq[String](0)
    assert(out == Seq("lo", "w"))
  }

  test("learnMerges golden on a tiny weighted corpus") {
    import spark.implicits._
    // corpus: "low low low lower newest newest"
    // chars: l,o,w ×4-ish … classic walk: first merges build "lo","low",
    // then "ne"/"ew"… verify the first merges by hand:
    // pair counts step1: (l,o)=4, (o,w)=4, (w,e)=3, (e,r)=1, (n,e)=2,
    // (e,w)=2, (w,s)=2, (s,t)=2, (e,s)=2 → tie (l,o) vs (o,w): lex
    // "l o" < "o w" → merge (l,o).
    val docs = Seq("low low low lower newest newest").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(merges(0) == ((1, "l", "o", 4L)))
    // step2: "lo" exists; (lo,w)=4 is now the top pair
    assert(merges(1) == ((2, "lo", "w", 4L)))
    // step3: low=[low] has no pairs; lower=[low,e,r], newest=[n,e,w,
    // e,s,t]×2 → all of (n,e),(e,w),(w,e),(e,s),(s,t) tie at 2;
    // lexicographic min "e s" wins.
    assert(merges(2) == ((3, "e", "s", 2L)))
    // learning is deterministic under repartitioning
    val again = Bpe.learnMerges(docs.repartition(7), "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(merges.toSeq == again.toSeq)
  }

  test("merged tokens reconstruct their words (no symbol loss)") {
    import spark.implicits._
    val docs = Seq("the cat sat on the mat", "the bat and the cat")
      .toDF("text")
    // apply the learned merges manually to one word and check concat
    val merges = Bpe.learnMerges(docs, "text", 5)
      .collect().map(r => (r.getString(1), r.getString(2)))
    var sym = Seq("t", "h", "e")
    merges.foreach { case (a, b) =>
      val buf = scala.collection.mutable.ListBuffer[String]()
      sym.foreach { x =>
        if (buf.nonEmpty && buf.last == a && x == b)
          buf(buf.size - 1) = a + b
        else buf += x
      }
      sym = buf.toList
    }
    assert(sym.mkString == "the")
  }

  test("applyMerges walks a fixed merge chain in order (encode golden)") {
    import spark.implicits._
    val merges = Seq("e" -> "r", "m" -> "er")
    // "merger": chars → (e,r) → [m,er,g,er] → (m,er) → [mer,g,er]
    val got = Seq("merger").toDF("w")
      .select(Bpe.applyMerges(split(col("w"), ""), merges).as("sym"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("mer", "g", "er"))
    // order matters: reversing the chain never forms "mer"
    val rev = Seq("merger").toDF("w")
      .select(Bpe.applyMerges(split(col("w"), ""), merges.reverse).as("sym"))
      .collect()(0).getSeq[String](0)
    assert(rev == Seq("m", "er", "g", "er"))
  }

  test("encodeColumn flattens per-word encodings document-wise") {
    import spark.implicits._
    val got = Seq("er me mer").toDF("t")
      .select(Bpe.encodeColumn(col("t"), Seq("e" -> "r", "m" -> "er")).as("e"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("er", "m", "e", "mer"))
  }
}
