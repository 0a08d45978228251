package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Planted-duplicate tests for the dedup operators. */
class DedupSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    Seq(
      (1L, base),
      (2L, base),                                         // exact dup of 1
      (3L, base.replace("today", "tonight")),             // near dup of 1
      (4L, "completely different words about spark catalyst tungsten shuffle exchange plans"),
      (5L, "another unrelated document mentioning parquet columnar scans and predicate pushdown")
    ).toDF("doc_id", "text")
  }

  test("exactKeepers keeps one row per distinct content") {
    val keepers = Dedup.exactKeepers(corpus, "doc_id", "text")
    assert(keepers.count() == 4) // 1&2 collapse
    val ids = keepers.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 4L, 5L)) // min id survives
  }

  test("minhashDedup finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashDedup(corpus, "doc_id", "text",
      k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("jaccard of identical docs is 1.0") {
    val j = Dedup.minhashDedup(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .head().getDouble(2)
    assert(j == 1.0)
  }

  test("ngramJaccardDedup is exact: finds dups across size buckets, boundary sizes kept") {
    val pairs = Dedup.ngramJaccardDedup(corpus, "doc_id", "text",
      k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 >= 4L || p._2 >= 4L))
    // boundary: J exactly at threshold survives the float prefilter.
    // A = 5 shingles, B = subset with 4 → J = 4/5 = 0.8 exactly.
    import spark.implicits._
    val boundary = Seq(
      (1L, "a b c d e f g"),  // shingles: abc bcd cde def efg (5)
      (2L, "a b c d e f")     // shingles: abc bcd cde def (4) ⊂ A
    ).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardDedup(boundary, "doc_id", "text",
      k = 3, threshold = 0.8).collect()
    assert(got.length == 1 && got.head.getDouble(2) == 0.8)
  }

  test("simhashDedup: identical docs at hamming 0, unrelated docs far") {
    val pairs = Dedup.simhashDedup(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 == 0))
    assert(!pairs.exists(p => p._2 == 4L || p._2 == 5L && p._1 == 4L))
  }

  test("winnowing guarantee: shared substring of length >= n+w-1 shares a fingerprint") {
    import spark.implicits._
    val shared = "zq8x1vbn m2kp9 wq7rt yy3z" // 25 chars >= n + w - 1 = 16
    val df = Seq(
      (1L, s"aaa unique prefix one $shared"),
      (2L, s"completely different lead-in $shared trailing bits"),
      (3L, "nothing in common here at all kjhgfd")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text", n = 12, w = 5)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    // dedup flags only the overlapping pair
    val pairs = Dedup.winnowDedup(df, "doc_id", "text",
      n = 12, w = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("winnowing of short text yields its single gram-min fingerprint") {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, "exactly12chr")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text", n = 12, w = 5)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.length }
    assert(!fps.contains(1L)) // shorter than one gram → no fingerprints
    assert(fps(2L) == 1)
  }

  test("embeddingNearDup finds planted near-identical vectors") {
    import spark.implicits._
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val vNear = v.clone(); vNear(0) = v(0) + 0.001f
    val vFar = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq(
      (1L, v.toSeq, 0), (2L, vNear.toSeq, 0), (3L, vFar.toSeq, 0),
      (4L, v.toSeq, 1) // same vector, different block → never paired
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDup(df, "vec_id", "embedding", "label", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticDedup flags smaller-id cosine neighbors within a cell") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Two well-separated blobs; ids 1,2 identical (same cell, cos=1),
    // id 3 near them but below threshold-able? -> use orthogonal-ish
    val a = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val b = Array.tabulate(8)(i => if (i >= 4) 1.0f else 0.0f)
    val aJit = a.clone(); aJit(7) = 0.01f
    val df = Seq(
      (1L, a.toSeq, 0), (2L, a.toSeq, 0), (3L, aJit.toSeq, 0),
      (4L, b.toSeq, 1), (5L, b.map(v => v * 2f).toSeq, 1)
    ).toDF("vec_id", "embedding", "label")
    val idx = graft.operators.Similarity.buildIvfIndex(
      df, "vec_id", "embedding", nCells = 2, iters = 3)
    val got = Dedup.semanticDedup(idx, "vec_id", threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    idx.release()
    assert(got(1L) === false) // smallest id of its dup set = keeper
    assert(got(2L) === true)  // identical to 1 → dup
    assert(got(3L) === true)  // cos(a, aJit) > 0.999 → dup of 1
    assert(got(4L) === false)
    assert(got(5L) === true)  // same direction as 4 → cos = 1
  }

  test("decontaminate counts distinct shared shingles against the benchmark") {
    import spark.implicits._
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains "the quick brown" and "quick brown fox" (k=3)
      (1L, "see the quick brown fox run"),
      // repeats a benchmark shingle twice — still counts once
      (2L, "the lazy dog and the lazy dog again"),
      (3L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(corpus, bench, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(1L) == 2L) // "the quick brown", "quick brown fox"
    assert(hits(2L) == 1L) // "the lazy dog", deduped within doc
    assert(!hits.contains(3L)) // zero overlap → absent
  }

  test("nearDupClusters labels components with their min id") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("id")
    // chain 1-2-3 (transitive through 2), pair 4-5, isolated 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("nearDupClusters frees each round's checkpoint: persisted RDDs stay O(1)") {
    import spark.implicits._
    val sc = spark.sparkContext
    // A 64-node path graph forces ~log2(64) pointer-doubling rounds —
    // enough that a leak of one checkpoint per round is unambiguous.
    val nodes = (1L to 64L).toDF("id")
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = sc.getPersistentRDDs.size
    val got = Dedup.nearDupClusters(nodes, pairs)
    assert(got.filter(col("cluster") =!= 1L).count() == 0)
    val leaked = sc.getPersistentRDDs.size - before
    // Allowed residue: the final round's checkpoint blocks (the result
    // reads them) — a small constant, NOT one per round.
    assert(leaked <= 4, s"persisted RDD leak: $leaked new entries survive")
  }

  test("crossNearDup finds planted cross-corpus dups, never within-side pairs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val a = Seq(
      (1L, base),
      (2L, "completely different text about distributed query engines here"),
      (3L, base + " with a small tail change")).toDF("doc_id", "text")
    val b = Seq(
      (11L, base), // dup of A:1
      (12L, "unrelated b-side document that matches nothing at all today"),
      (13L, "completely different text about distributed query engines here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossNearDup(a, b, "doc_id", "text",
      k = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 11L)))
    assert(pairs.contains((2L, 13L)))
    // ids always drawn (A, B) — no within-side pair can appear
    assert(pairs.forall { case (x, y) => x <= 3 && y >= 11 })
  }

  test("dupSpanStats: planted shared and repeated spans, unique doc at zero") {
    import spark.implicits._
    // 10-token docs, k=4 → 7 grams each. Docs 1 and 2 share their
    // first 5 tokens → grams at offsets 0,1 (2 occurrences each in
    // both docs' counts). Doc 3 repeats a 4-gram within itself. Doc 4
    // is entirely unique.
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e x y z w v"),
      (3L, "p q r s p q r s t u"),
      (4L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // Every doc has 10-4+1 = 7 gram occurrences.
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_._1 == 7L))
    // Docs 1,2: "a b c d" and "b c d e" are shared → 2 dup occurrences.
    assert(got(1L)._2 == 2L && got(2L)._2 == 2L)
    assert(math.abs(got(1L)._3 - 2.0 / 7.0) < 1e-15)
    // Doc 3: "p q r s" occurs twice WITHIN the doc → both occurrences
    // are duplicated spans (plus no cross-doc grams).
    assert(got(3L)._2 == 2L)
    // Doc 4: fully unique.
    assert(got(4L)._2 == 0L && got(4L)._3 == 0.0)
  }

  test("fuzzyPairsD1 finds every edit-type at distance <= 1, rejects distance 2") {
    import spark.implicits._
    val df = Seq(
      (1L, "cold bolt"),
      (2L, "old bolt"),   // deletion of 'c' from 1
      (3L, "gold bolt"),  // substitution vs 1, distance 2 from 2? (g->o... ) lev(old,gold)=1 insertion
      (4L, "cold bolts"), // insertion vs 1
      (5L, "ab"),
      (6L, "ba"),         // transposition = distance 2, shares deletion sigs
      (7L, "zzz unrelated")
    ).toDF("id", "name")
    val pairs = Dedup.fuzzyPairsD1(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // deletion
    assert(pairs.contains((1L, 3L))) // substitution
    assert(pairs.contains((1L, 4L))) // insertion
    assert(pairs.contains((2L, 3L))) // insertion at front
    assert(!pairs.contains((5L, 6L))) // "ab"/"ba" share sigs but lev=2
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => a == 7L || b == 7L })
  }

  test("stripBoilerplate drops shared lines, keeps order, handles all-boiler docs") {
    import spark.implicits._
    val banner = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"alpha unique one\n$banner\nalpha unique two"),
      (2L, s"$banner\nbeta body line"),
      (3L, banner),                    // nothing survives
      (4L, "short\nln"),               // short lines exempt from df rule
      (5L, "short\nln")                // dup short lines still kept
    ).toDF("id", "text")
    val got = Dedup.stripBoilerplate(docs, "id", "text", minDocs = 2,
        minLineChars = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got(1L) == (("alpha unique one\nalpha unique two", 2L)))
    assert(got(2L) == (("beta body line", 1L)))
    assert(got(3L) == (("", 0L)))
    assert(got(4L) == (("short\nln", 2L)))
    assert(got(5L) == (("short\nln", 2L)))
  }

  test("fuzzyPairsD1 matches brute-force levenshtein on a random vocabulary") {
    import spark.implicits._
    // small alphabet + short strings => dense edit-distance-1 structure
    val rnd = new scala.util.Random(7)
    val words = (0 until 120).map(i =>
      (i.toLong, (0 until (2 + rnd.nextInt(4))).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString))
    val df = words.toDF("id", "name")
    val got = Dedup.fuzzyPairsD1(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- words; (ib, sb) <- words
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("scrubDupSpans keeps the first occurrence, scrubs the rest") {
    import spark.implicits._
    val span = (1 to 4).map(i => s"dup$i").mkString(" ") // k=4 planted span
    val docs = Seq(
      (1L, s"alpha $span beta"),            // canonical (min doc)
      (2L, s"gamma delta $span"),           // non-canonical → scrubbed
      (3L, "unique words only here"),       // untouched
      (4L, s"$span mid $span")              // within-doc repeat: 2nd goes
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .scrubDupSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 holds the canonical occurrence (min doc, min pos): kept 6
    assert(got(1L) == ((6L, 0L)))
    // doc 2 loses exactly the 4 span tokens
    assert(got(2L) == ((2L, 4L)))
    // doc 3 untouched
    assert(got(3L) == ((4L, 0L)))
    // doc 4: both its occurrences are non-canonical (doc 1 owns the
    // gram) → 8 tokens scrubbed, "mid" survives
    assert(got(4L) == ((1L, 8L)))
    // the rebuilt-text fingerprint of an untouched doc equals md5(text)
    val fp3 = graft.operators.Dedup
      .scrubDupSpans(docs, "doc_id", "text", k = 4)
      .filter($"doc_id" === 3L).head().getString(3)
    assert(fp3 == java.security.MessageDigest.getInstance("MD5")
      .digest("unique words only here".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("simhashDedupMd5: explode-aggregate signatures are bit-identical " +
    "to an independent driver-side replay") {
    // The r8 rewrite replaced the per-doc interpreted HOF vote fold
    // with explode + 64 codegen'd SUM aggregates. This differential
    // recomputes the md5 simhash spec from scratch on the driver —
    // md5 hex per token, bit i = bit (i%4) of hex digit (i/4+1),
    // ±1 votes summed, 4×16-bit chunks, pigeonhole banding + exact
    // hamming — and demands the operator's pair set AND hamming
    // values match exactly.
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "The Quick brown fox jumps over the lazy dog"), // = 1 lowered
      (4L, "entirely different content about parquet shuffles"),
      (5L, "   "), // tokenizes to nothing -> excluded
      (6L, "one-token")
    ).toDF("doc_id", "text")
    def sig(text: String): Array[Int] = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val votes = Array.fill(64)(0)
      for (t <- toks) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        for (i <- 0 until 64) {
          val nib = Integer.parseInt(hex.substring(i / 4, i / 4 + 1), 16)
          votes(i) += (if (((nib >> (i % 4)) & 1) == 1) 1 else -1)
        }
      }
      Array.tabulate(4)(c => (0 until 16)
        .map(p => if (votes(c * 16 + p) >= 0) 1 << p else 0).sum)
    }
    def hamming(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val sigs = Map(1L -> sig(docs.collect()(0).getString(1)),
      2L -> sig("the quick brown fox jumps over the lazy dog today"),
      3L -> sig("The Quick brown fox jumps over the lazy dog"),
      4L -> sig("entirely different content about parquet shuffles"),
      6L -> sig("one-token"))
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = hamming(sigs(a), sigs(b)) if h <= 3
      if sigs(a).zip(sigs(b)).exists { case (x, y) => x == y } // banding
    } yield (a, b, h)).toSet
    val got = Dedup.simhashDedupMd5(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, s"got $got expected $expected")
    assert(expected.contains((1L, 3L, 0))) // the planted exact pair
  }
}
