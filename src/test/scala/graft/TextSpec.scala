package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Golden-vector tests for the text-analysis functions. */
class TextSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq(text).toDF("text")
  }

  test("tokenCount and avgTokenLen") {
    val r = one("The quick  brown fox")
      .select(Text.tokenCount(col("text")), Text.avgTokenLen(col("text")))
      .head()
    assert(r.getInt(0) == 4)
    assert(r.getDouble(1) == 16.0 / 4)
  }

  test("shingles produce overlapping word k-grams") {
    val r = one("a b c d")
      .select(Text.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = one("a b")
      .select(Text.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("native token-shingle kernel equals the HOF formulation") {
    import spark.implicits._
    // Randomized differential law: the codegen'd TokenShingles kernel
    // must reproduce the transform/slice/concat_ws formulation it
    // replaced, element for element, across k and token-array shapes
    // (empty arrays, n < k, n == k, repeated and empty-string tokens).
    val rnd = new scala.util.Random(11)
    val vocab = Array("a", "bb", "ccc", "", "dd", "éé")
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(9))(vocab(rnd.nextInt(vocab.length))))
    val df = rows.toDF("ts")
    for (k <- 1 to 4) {
      val got = df.select(Text.shinglesOfTokens(col("ts"), k).as("s"))
        .collect().map(_.getSeq[String](0))
      val want = df.select(Text.shinglesOfTokensHof(col("ts"), k).as("s"))
        .collect().map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"k=$k mismatch")
    }
    // Null input → null out (both paths).
    val nullRow = Seq((1, null: Seq[String])).toDF("i", "ts")
    assert(nullRow.select(Text.shinglesOfTokens(col("ts"), 2)).head().isNullAt(0))
  }

  test("graft_token_shingles is registered as a SQL function") {
    val r = spark.sql(
      "SELECT graft_token_shingles(array('x','y','z'), 2) AS s")
      .head().getSeq[String](0)
    assert(r == Seq("x y", "y z"))
  }

  test("langId picks the majority-stopword language, und when none") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on the mat and it is fine",
      "der hund und die katze ist nicht da",
      "xyzzy qwerty").toDF("text")
    val got = df.select(Text.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("fingerprint is whitespace-insensitive and case-insensitive") {
    val a = one("Hello   World").select(Text.fingerprint(col("text"))).head().getString(0)
    val b = one("hello world").select(Text.fingerprint(col("text"))).head().getString(0)
    val c = one("hello worlds").select(Text.fingerprint(col("text"))).head().getString(0)
    assert(a == b && a != c)
  }

  test("bpeTokenCount splits digits, punctuation, and contractions") {
    // "don't stop, it's 2024!" → don / 't / stop / , / it / 's / 2024 / !
    val r = one("don't stop, it's 2024!")
      .select(Text.bpeTokenCount(col("text")), Text.tokenCount(col("text")))
      .head()
    assert(r.getInt(0) == 8)
    assert(r.getInt(1) == 4)
    // pure prose: one bpe piece per word
    val p = one("the quick brown fox")
      .select(Text.bpeTokenCount(col("text"))).head().getInt(0)
    assert(p == 4)
  }

  test("qualityScore rewards stopword-rich prose, penalizes noise") {
    val prose = one("the cat is on the mat and it is a fine day")
      .select(Text.qualityScore(col("text"))).head().getDouble(0)
    val noise = one("x9 77..2 !!!: 123 9z.")
      .select(Text.qualityScore(col("text"))).head().getDouble(0)
    assert(prose > noise)
    assert(prose <= 1.0 && noise >= 0.0)
  }

  test("deflateRatio flags repetitive junk, is deterministic, SQL-registered") {
    import graft.functions.CompressionFunctions.deflateRatio
    val junk = one("spam " * 400)
      .select(deflateRatio(col("text"))).head().getDouble(0)
    val varied = one((1 to 400).map(i => s"w${i * 7919 % 1000}x$i").mkString(" "))
      .select(deflateRatio(col("text"))).head().getDouble(0)
    assert(junk < 0.05, s"repetition should compress hard, got $junk")
    assert(varied > 3 * junk, s"varied=$varied junk=$junk")
    // deterministic re-run, and the SQL registration agrees
    one("spam " * 400).createOrReplaceTempView("cmp_docs")
    val viaSql = spark.sql(
      "SELECT graft_deflate_ratio(text) FROM cmp_docs").head().getDouble(0)
    assert(viaSql == junk)
    // empty input is defined
    assert(one("").select(deflateRatio(col("text"))).head().getDouble(0) == 1.0)
  }

  test("deflateRatio matches independently computed zlib golden values") {
    // Reference values computed OUTSIDE the JVM (CPython's zlib at
    // level 6 — len(zlib.compress(s.encode(), 6)) / len(s)), so the
    // kernel is pinned against an independent implementation of the
    // public DEFLATE/zlib formats — the hard signal the q_compress
    // registry row can't get from the SQL oracle (no zlib in DuckDB).
    val goldens = Seq(
      "hello world" -> 19.0 / 11,
      "a" * 40 -> 12.0 / 40,
      ("The quick brown fox jumps over the lazy dog. " * 4) -> 55.0 / 180,
      "abc" -> 11.0 / 3,
      "x" -> 9.0,
      "spamspamspamspamspamspamspamspamspamspam eggs" -> 20.0 / 45,
      (0 until 256).map(i => (33 + (i * 7) % 90).toChar).mkString -> 102.0 / 256)
    goldens.foreach { case (s, expected) =>
      val got = graft.functions.TextKernels.deflateRatio(
        s.getBytes("UTF-8"))
      assert(got == expected, s"deflate golden for ${s.take(20)}…: " +
        s"got $got expected $expected")
    }
    // invariance laws: partition placement can't change the ratio, and
    // repetition is monotone (k copies never compress worse per byte)
    import spark.implicits._
    import graft.functions.CompressionFunctions.deflateRatio
    val df = goldens.map(_._1).toDF("text")
    val onePart = df.coalesce(1).select(deflateRatio(col("text")))
      .collect().map(_.getDouble(0)).sorted.toSeq
    val manyPart = df.repartition(7).select(deflateRatio(col("text")))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(onePart == manyPart)
    val r1 = graft.functions.TextKernels.deflateRatio(
      ("lorem ipsum dolor " * 4).getBytes("UTF-8"))
    val r16 = graft.functions.TextKernels.deflateRatio(
      ("lorem ipsum dolor " * 64).getBytes("UTF-8"))
    assert(r16 < r1, s"repetition should compress harder: $r16 vs $r1")
  }

  test("redact scrubs planted PII with deterministic placeholders") {
    import spark.implicits._
    val s = "mail bob.smith+x@corp.example.org or 10.0.42.7 " +
      "or call +1 (415) 555-0100 now"
    val out = Seq(Tuple1(s)).toDF("text")
      .select(graft.functions.Text.redact(col("text")),
        graft.functions.Text.piiCount(col("text"),
          graft.functions.Text.piiPatterns(0)._1),
        graft.functions.Text.piiCount(col("text"),
          graft.functions.Text.piiPatterns(1)._1))
      .head()
    assert(out.getString(0) == "mail <EMAIL> or <IP> or call <PHONE> now")
    assert(out.getInt(1) == 1 && out.getInt(2) == 1)
    // clean text passes through untouched
    val clean = "no personal information in this sentence at all"
    assert(Seq(Tuple1(clean)).toDF("text")
      .select(graft.functions.Text.redact(col("text")))
      .head().getString(0) == clean)
  }

  test("bigramSurprisal: hand-computed MLE cross-entropy, 6dp") {
    import spark.implicits._
    // Corpus counts: "a b"→3, "b a"→1, "b c"→1; ctx "a"→3, ctx "b"→2.
    // d1 terms: 0, ln2, 0 → mean ln2/3; d2 terms: 0, ln2 → mean ln2/2.
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = graft.operators.Lm.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, r6(math.log(2) / 3))))
    assert(got(2L) == ((2L, r6(math.log(2) / 2))))
  }

  test("nfc composes decomposed accents; cleanup collapses exotic space") {
    import graft.functions.NormalizeFunctions
    // "e\u0301" (e + COMBINING ACUTE) must compose to U+00E9; NBSP
    // (U+00A0) and ideographic space (U+3000) collapse to one ASCII
    // space; C0 control (BEL) dropped; trailing space trimmed;
    // already-clean text passes through unchanged.
    val dirty = "cafe\u0301 du\u00a0\u3000monde \u0007 ok "
    val got = one(dirty)
      .select(NormalizeFunctions.cleanup(col("text"))).head().getString(0)
    assert(got == "caf\u00e9 du monde ok")
    val clean = "plain ascii text"
    assert(one(clean).select(NormalizeFunctions.cleanup(col("text")))
      .head().getString(0) == clean)
    // nfc alone: composition only, idempotent on composed input
    assert(one("e\u0301").select(NormalizeFunctions.nfc(col("text")))
      .head().getString(0) == "\u00e9")
    assert(one("\u00e9").select(NormalizeFunctions.nfc(col("text")))
      .head().getString(0) == "\u00e9")
  }

  test("graft_nfc is registered as a SQL function") {
    val r = spark.sql("SELECT graft_nfc('e\u0301') AS s").head().getString(0)
    assert(r == "\u00e9")
  }

  test("qualityClassifier separates a planted separable corpus") {
    import spark.implicits._
    // 'aaa'\u2192bucket 4, 'bbb'\u2192bucket 0: class-pure bucket distributions,
    // linearly separable, so a few steps at high lr must split them.
    val docs = (1L to 10L).map(i =>
      (i, if (i <= 5) "aaa aaa aaa" else "bbb bbb bbb", i <= 5))
      .toDF("doc_id", "text", "lab")
    val out = graft.operators.Lm.qualityClassifier(
      docs, "doc_id", "text", label = col("lab"),
      buckets = 16, iters = 20, lr = 8.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2))))
      .toMap
    (1L to 5L).foreach(i => assert(out(i)._2 == 1, s"doc $i: ${out(i)}"))
    (6L to 10L).foreach(i => assert(out(i)._2 == 0, s"doc $i: ${out(i)}"))
    // identical docs score identically (featurization is content-pure)
    assert(out(1L)._1 == out(2L)._1)
  }

  test("tokenEntropy: hand-computed goldens, bounds, degenerate doc") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a a b"),       // H = ln 3 − (2·ln 2)/3
      (2L, "a b c"),       // uniform: H = ln 3
      (3L, "x x x x"),     // single type: H = 0
      (4L, "   ")          // whitespace-only: absent
    ).toDF("doc_id", "text")
    val got = graft.operators.Lm.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(!got.contains(4L))
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 -
      (math.log(3.0) - 2.0 * math.log(2.0) / 3.0)) < 1e-6)
    assert(math.abs(got(2L)._2 - math.log(3.0)) < 1e-6)
    assert(got(3L) == (4L, 0.0))
    // entropy is bounded by ln(n_tokens)
    got.values.foreach { case (n, h) =>
      assert(h >= 0.0 && h <= math.log(n.toDouble) + 1e-9)
    }
  }
}
