package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** ANN tests: brute-force exactness on a tiny golden set, IVF recall on
  * the embeddings fixture. */
class SimilaritySpec extends SparkSpec {

  test("bruteForceTopK returns exact ranked neighbors") {
    import spark.implicits._
    // 2-d vectors at known angles from the x-axis query.
    def vec(deg: Double) = Seq(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val corpus = Seq(
      (10L, vec(5)), (11L, vec(30)), (12L, vec(60)), (13L, vec(90)),
      (14L, vec(170))).toDF("vec_id", "embedding")
    val queries = Seq((1L, vec(0))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    assert(got.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
    assert(got.head.getDouble(3) > 0.99)
  }

  test("ivfTopK achieves high recall vs brute force on fixture embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(e, q, "vec_id", "embedding", 10,
      nCells = 8, nprobe = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
    // every IVF result set still has k rows per query
    assert(approx.size == exact.size)
  }

  test("PQ probe achieves high recall vs brute force on fixture embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.buildPqIndex(e, "vec_id", "embedding",
      m = 8, ksub = 8)
    val approx = Similarity.probePq(idx, e, q, "vec_id", "embedding",
      k = 10, refine = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    idx.release()
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"PQ recall $recall too low")
    assert(approx.size == exact.size) // k rows per query survive re-rank
  }

  test("PQ codes are m small ints; re-ranked scores are exact cosines") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = Similarity.buildPqIndex(e, "vec_id", "embedding",
      m = 4, ksub = 8)
    val codes = idx.codes.collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.size == 4 && cs.forall(c => c >= 0 && c < 8))
    }
    val q = e.filter(col("vec_id") < 2)
    val got = Similarity.probePq(idx, e, q, "vec_id", "embedding",
      k = 5, refine = 4).collect()
    idx.release()
    // every reported score equals the exact cosine of that pair
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    got.foreach { r =>
      val (qid, nid, cos) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val (a, b) = (vecs(qid), vecs(nid))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      val expect = dot / math.sqrt(na) / math.sqrt(nb)
      assert(math.abs(cos - expect) < 1e-9,
        s"pair ($qid,$nid): $cos vs $expect")
    }
  }

  test("probeIvfPq with all cells probed equals the flat PQ probe") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 4)
    val flat = Similarity.buildPqIndex(e, "vec_id", "embedding",
      m = 4, ksub = 8)
    val expected = Similarity.probePq(flat, e, q, "vec_id", "embedding",
      k = 5, refine = 3).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).sorted
    flat.release()
    val composed = Similarity.buildIvfPqIndex(e, "vec_id", "embedding",
      nCells = 4, m = 4, ksub = 8)
    // nprobe = nCells ⇒ every cell probed ⇒ same ADC candidate set
    val got = Similarity.probeIvfPq(composed, e, q, "vec_id", "embedding",
      k = 5, nprobe = 4, refine = 3).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).sorted
    composed.release()
    assert(got.sameElements(expected))
  }

  test("PQ index round-trips through parquet: saved codes probe identically") {
    // Same 100 TB contract as the IVF round-trip: train codebooks and
    // encode once, persist the m-byte codes, probe from storage. The
    // codebooks are KiB-scale driver state — stored as one parquet row
    // of nested arrays.
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 4)
    val built = Similarity.buildPqIndex(e, "vec_id", "embedding",
      m = 4, ksub = 8)
    val fresh = Similarity.probePq(built, e, q, "vec_id", "embedding",
      k = 5, refine = 3).collect().map(_.toSeq).toSet

    built.codes.write.parquet(s"$dir/codes")
    import spark.implicits._
    Seq(built.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
      .toDF("cb").write.parquet(s"$dir/codebooks")
    val (m, ksub, ds) = (built.m, built.ksub, built.ds)
    built.release()

    val cb = spark.read.parquet(s"$dir/codebooks")
      .head().getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](0)
      .map(_.map(_.toArray).toArray).toArray
    val loaded = Similarity.PqIndex(
      spark.read.parquet(s"$dir/codes"), cb, m, ksub, ds)
    val reloaded = Similarity.probePq(loaded, e, q, "vec_id", "embedding",
      k = 5, refine = 3).collect().map(_.toSeq).toSet
    assert(reloaded == fresh)
  }

  test("IVF index round-trips through parquet: saved index probes identically") {
    // The 100 TB contract: build once, write the index, probe many
    // times from storage. assigned is partitioned by cell on disk so a
    // probe reads only its cells' files.
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 8)
    val built = Similarity.buildIvfIndex(e, "vec_id", "embedding", nCells = 8)
    val fresh = Similarity.probeIvf(built, q, "vec_id", "embedding", 10, 4)
      .collect().map(_.toSeq).toSet

    built.assigned.write.partitionBy("cell").parquet(s"$dir/assigned")
    built.centroids.write.parquet(s"$dir/centroids")
    built.release()

    val cents = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    val loaded = Similarity.IvfIndex(
      spark.read.parquet(s"$dir/assigned"),
      org.apache.spark.sql.functions.broadcast(
        spark.read.parquet(s"$dir/centroids")),
      cents.map(_._2.toArray))
    val reloaded = Similarity.probeIvf(loaded, q, "vec_id", "embedding", 10, 4)
      .collect().map(_.toSeq).toSet
    assert(reloaded == fresh)
  }

  test("knnJoinIvf equals probeIvf for identical parameters") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = Similarity.buildIvfIndex(e, "vec_id", "embedding", nCells = 8)
    try {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSet
      val viaBroadcast = canon(
        Similarity.probeIvf(idx, e, "vec_id", "embedding", k = 5, nprobe = 3))
      val viaShuffle = canon(
        Similarity.knnJoinIvf(idx, e, "vec_id", "embedding", k = 5, nprobe = 3))
      assert(viaShuffle == viaBroadcast)
      assert(viaShuffle.nonEmpty)
    } finally idx.release()
  }

  test("knnJoinHier with every super open equals the flat knnJoinIvf") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val hier = Similarity.buildHierIvfIndex(e, "vec_id", "embedding")
    try {
      val nSuper = hier.superMatrix.length
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSet
      // nsp >= nSuper opens every super, so the candidate cell set is
      // ALL cells and the two-level pick degenerates to the flat pick.
      val viaHier = canon(Similarity.knnJoinHier(hier, e,
        "vec_id", "embedding", k = 5, nprobe = 3, nsp = nSuper))
      val viaFlat = canon(Similarity.knnJoinIvf(hier.base, e,
        "vec_id", "embedding", k = 5, nprobe = 3))
      assert(viaHier == viaFlat)
      assert(viaHier.nonEmpty)
      // every cell is assigned to an in-range super
      assert(hier.cellToSuper.forall(s => s >= 0 && s < nSuper))
      assert(hier.cellToSuper.length == hier.base.matrix.length)
    } finally hier.release()
  }

  test("hierarchical pick keeps recall against brute force when nsp < nSuper") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val hier = Similarity.buildHierIvfIndex(e, "vec_id", "embedding")
    try {
      val nSuper = hier.superMatrix.length
      assert(nSuper >= 2)
      // Force a genuinely two-level pick: open only half the supers.
      val nsp = math.max(1, nSuper / 2)
      val got = Similarity.knnJoinHier(hier, e, "vec_id", "embedding",
          k = 5, nprobe = 3, nsp = nsp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val flat = Similarity.knnJoinIvf(hier.base, e, "vec_id", "embedding",
          k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hierRecall = got.count(truth).toDouble / truth.size
      val flatRecall = flat.count(truth).toDouble / truth.size
      // The claim under test is RELATIVE: restricting the pick to half
      // the super-cells must not crater recall vs the flat pick at the
      // same nprobe (at this toy corpus size — ~3 vectors per cell —
      // absolute recall floors are meaningless).
      assert(hierRecall >= 0.7 * flatRecall,
        s"hier recall $hierRecall < 0.7×flat $flatRecall (nsp=$nsp/$nSuper)")
    } finally hier.release()
  }

  test("appendToIndex serves the delta under the frozen centroids") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val old = e.filter(col("vec_id") % 5 =!= 0)
    val delta = e.filter(col("vec_id") % 5 === 0)
    val base = Similarity.buildIvfIndex(old, "vec_id", "embedding", nCells = 8)
    val full = Similarity.appendToIndex(base, delta, "vec_id", "embedding")
    try {
      // centroids are untouched by the append
      assert(full.matrix.zip(base.matrix)
        .forall { case (a, b) => a.sameElements(b) })
      // every corpus row is in exactly one segment of the union
      assert(full.assigned.count() == e.count())
      // delta assignment law: equals NearestCell under the frozen matrix
      val expect = delta.select(col("vec_id"),
        graft.functions.VectorFunctions
          .nearestCell(col("embedding"), base.matrix).as("cell"))
      val got = full.assigned.filter(col("neighbor_id") % 5 === 0)
        .select(col("neighbor_id").as("vec_id"), col("cell"))
      assert(got.except(expect).count() == 0)
      assert(expect.except(got).count() == 0)
    } finally { full.release(); base.release() }
  }

  test("probe-set guard: oversized query side fails fast with the redirect") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3,
        maxProbeRows = 4)
    }
    assert(ex.getMessage.contains("knnJoinIvf"))
    val idx = Similarity.buildIvfIndex(e, "vec_id", "embedding", nCells = 4)
    try {
      val ex2 = intercept[IllegalArgumentException] {
        Similarity.probeIvf(idx, q, "vec_id", "embedding", k = 3,
          maxProbeRows = 4)
      }
      assert(ex2.getMessage.contains("knnJoinHier"))
      // at the default ceiling the same probe set is fine
      assert(Similarity.probeIvf(idx, q, "vec_id", "embedding", k = 3)
        .count() > 0)
    } finally idx.release()
  }

  test("table-state hier index equals the literal build bit-for-bit") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val lit = Similarity.buildHierIvfIndex(e, "vec_id", "embedding")
    val tab = Similarity.buildHierIvfTableIndex(e, "vec_id", "embedding")
    try {
      // identical super layer (same sample, same Lloyd)
      assert(tab.superMatrix.zip(lit.superMatrix)
        .forall { case (a, b) => a.sameElements(b) })
      // identical cell centroids and cell→super map
      val tabCells = tab.cells.select("cell", "sup", "centroid").collect()
        .map(r => r.getInt(0) -> (r.getInt(1), r.getSeq[Double](2).toArray))
        .toMap
      assert(tabCells.size == lit.base.matrix.length)
      lit.base.matrix.zipWithIndex.foreach { case (c, i) =>
        assert(tabCells(i)._1 == lit.cellToSuper(i), s"sup of cell $i")
        assert(tabCells(i)._2.sameElements(c), s"centroid of cell $i")
      }
      // identical corpus assignment
      def asn(df: org.apache.spark.sql.DataFrame) = df
        .select("neighbor_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(asn(tab.assigned) == asn(lit.base.assigned))
      // identical probe results through the bounded-heap table pick
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSet
      val viaLit = canon(Similarity.knnJoinHier(lit, e,
        "vec_id", "embedding", k = 5, nprobe = 3, nsp = 2))
      val viaTab = canon(Similarity.knnJoinHierTable(tab, e,
        "vec_id", "embedding", k = 5, nprobe = 3, nsp = 2))
      assert(viaTab == viaLit)
      assert(viaTab.nonEmpty)
    } finally { lit.release(); tab.release() }
  }

  test("adaptive index build work grows ~n·√k, not n·k (the 100 TB law)") {
    import graft.functions.DistanceEvalCounter
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select("vec_id", "embedding")
    // k× corpora with ScaleUp's key-shift convention (10⁶ keeps the
    // pmod-8 training-gate residues identical across copies).
    def blowUp(k: Int) = (0 until k).map(i =>
        e.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def buildWork(corpus: org.apache.spark.sql.DataFrame): Long = {
      DistanceEvalCounter.reset()
      val idx = Similarity.buildHierIvfIndex(corpus, "vec_id", "embedding")
      idx.base.assigned.count() // materialized already; cheap re-read
      val w = DistanceEvalCounter.get
      idx.release()
      w
    }
    val small = blowUp(4)   // 2 000 vectors → 32 cells (past the floor)
    val big = blowUp(40)    // 20 000 vectors → 313 cells
    try {
      val w1 = buildWork(small)
      val w2 = buildWork(big)
      val ratio = w2.toDouble / w1
      // Hierarchical build: work ≈ c·n·√k ⇒ 10× data ≈ 10·√9.8 ≈ 31×.
      // The pre-r6 flat build (Lloyd over all k ∝ n centroids) measures
      // ~100× on the same pair. 45 cleanly separates the two regimes.
      assert(ratio < 45.0,
        s"build work grew ${ratio}× for 10× data ($w1 -> $w2) — " +
          "super-linear beyond n·√k")
      // and the absolute constant stays sample-bounded: ≤ ~12 evals
      // per (row, √k-centroid) unit at the big size
      val k2 = Similarity.cellsFor(20000)
      assert(w2 < 12L * 20000L * math.sqrt(k2.toDouble).toLong,
        s"absolute build work $w2 exceeds the sample-bounded budget")
    } finally { small.unpersist(); big.unpersist() }
  }

  test("adaptive sizing rules: cellsFor / supersFor") {
    assert(Similarity.cellsFor(500) == 16)    // sf0.01 — unchanged vs r4
    assert(Similarity.cellsFor(2000) == 32)   // sf0.1
    assert(Similarity.cellsFor(20000) == 313) // sf1 audit scale
    assert(Similarity.cellsFor(0) == 16)
    assert(Similarity.supersFor(16) == 4)
    assert(Similarity.supersFor(32) == 6)
    assert(Similarity.supersFor(313) == 18)
    // training-sample gate: full corpus in the fixed-floor regime,
    // 1-in-8 past it
    assert(Similarity.sampleModFor(500) == 1)
    assert(Similarity.sampleModFor(1024) == 1)
    assert(Similarity.sampleModFor(1025) == 8)
    assert(Similarity.sampleModFor(5000) == 8)
  }

  test("quantizeInt8 bounds values at ±127 and reconstructs within scale/2") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector edge
      (3L, Seq(-0.003f, 0.001f, 0.002f, -0.001f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0),
        (r.getDouble(1), r.getSeq[Int](2)))).toMap
    val (s1, q1) = rows(1L)
    assert(q1.forall(q => q >= -127 && q <= 127))
    assert(q1(1) == -127) // the max-|v| component hits the rail
    // reconstruction error bounded by half a quantization step
    Seq(0.5, -1.0, 0.25, 0.0).zip(q1).foreach { case (v, q) =>
      assert(math.abs(v - q * s1) <= s1 / 2 + 1e-12) }
    val (s2, q2) = rows(2L)
    assert(s2 == 0.0 && q2.forall(_ == 0))
    val (s3, q3) = rows(3L)
    assert(q3.max == 127 || q3.min == -127) // scale anchored to max |v|
    assert(s3 > 0)
  }

  test("quantizedTopK ranks the planted near-identical vector first") {
    import spark.implicits._
    val v = Array.tabulate(8)(i => 0.1f * (i + 1))
    val vNear = v.clone(); vNear(0) = v(0) + 0.001f
    val vFar = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((0L, v.toSeq), (1L, vNear.toSeq), (2L, vFar.toSeq),
      (3L, v.map(x => x * 0.5f).toSeq)).toDF("vec_id", "embedding")
    val top = Similarity.quantizedTopK(df, df.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 3).collect()
    assert(top.map(_.getInt(2)).toSeq == Seq(1, 2, 3)) // dense ranks
    assert(top(0).getLong(1) == 1L) // the near-identical vector wins
    // id 3 = 0.5·v quantizes to the IDENTICAL int vector (symmetric
    // quantization is scale-invariant) → same dot, id tie-break
    assert(top(1).getLong(1) == 3L && top(1).getLong(3) == top(0).getLong(3))
    assert(top(2).getLong(1) == 2L && top(2).getLong(3) < 0) // anti-correlated
  }

  test("table-path salted join on a hot cell equals the literal hier path") {
    import spark.implicits._
    val dim = 8
    // Same skew shape as the literal-path salting law below, but the
    // hot vectors are EXACTLY identical — identical vectors tie on
    // every centroid distance and the strict-< argmin sends all 600 to
    // one cell regardless of how k-means places centroids, forcing
    // ceil(size/256)>=2 splits in saltedCandidatesTable (the
    // distributed-count salt path) AND in the literal knnJoinHier salt
    // (driver-collected counts). Equality across the two
    // independently-salted implementations pins both re-keys.
    val hot = (0 until 600).map(i => (i.toLong,
      Seq.tabulate(dim)(d => if (d == 0) 1.0f else 0.1f)))
    val cold = (600 until 640).map(i => (i.toLong,
      Seq.tabulate(dim)(d => (if (d == 1) 1.0f else 0.0f)
        + 1e-3f * ((i % 11) + 1) * (d + 2))))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val lit = Similarity.buildHierIvfIndex(df, "vec_id", "embedding")
    val tab = Similarity.buildHierIvfTableIndex(df, "vec_id", "embedding")
    try {
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSet
      // the skew is real: the identical-vector cell exceeds the salt
      // threshold in BOTH index layouts
      assert(tab.assigned.groupBy(col("cell")).count()
        .collect().map(_.getLong(1)).max > 256)
      assert(lit.base.assigned.groupBy(col("cell")).count()
        .collect().map(_.getLong(1)).max > 256)
      val viaLit = canon(Similarity.knnJoinHier(lit, df,
        "vec_id", "embedding", k = 3, nprobe = 2, nsp = 2))
      val viaTab = canon(Similarity.knnJoinHierTable(tab, df,
        "vec_id", "embedding", k = 3, nprobe = 2, nsp = 2))
      assert(viaTab == viaLit)
      assert(viaTab.nonEmpty)
    } finally { lit.release(); tab.release() }
  }

  test("salted candidate join on a hot cell equals the unsalted broadcast probe") {
    import spark.implicits._
    val dim = 8
    // A deliberately skewed corpus: 600 distinct vectors in one tight
    // cluster (one cell of >256 members -> the kNN-join candidate path
    // MUST salt it over ceil(600/256)=3 buckets) plus 40 spread far
    // away. probeIvf never salts (broadcast probe set), so equality
    // proves the (cell, salt) re-key changes no candidate pair.
    val hot = (0 until 600).map(i => (i.toLong,
      Seq.tabulate(dim)(d => (if (d == 0) 1.0f else 0.0f)
        + 1e-4f * ((i % 37) + 1) * (d + 1))))
    val cold = (600 until 640).map(i => (i.toLong,
      Seq.tabulate(dim)(d => (if (d == 1) 1.0f else 0.0f)
        + 1e-3f * ((i % 11) + 1) * (d + 2))))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = Similarity.buildIvfIndex(df, "vec_id", "embedding", nCells = 2)
    try {
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
          .toSet
      // the skew is real: some cell exceeds the salt threshold
      val cellSizes = idx.assigned.groupBy(col("cell")).count()
        .collect().map(_.getLong(1))
      assert(cellSizes.max > 256, s"fixture not skewed: ${cellSizes.toSeq}")
      val salted = canon(Similarity.knnJoinIvf(idx, df,
        "vec_id", "embedding", k = 3, nprobe = 2))
      val plain = canon(Similarity.probeIvf(idx, df,
        "vec_id", "embedding", k = 3, nprobe = 2))
      assert(salted == plain)
      assert(salted.nonEmpty)
    } finally idx.release()
  }

  test("adaptive build never evicts a caller-cached small corpus") {
    import spark.implicits._
    // <=1024 rows: trainingSample's gate is mod==1 and returns the
    // caller's frame ITSELF — the build must not unpersist it.
    val corpus = (0 until 200).map(i => (i.toLong,
      Seq.tabulate(4)(d => (i * 7 % 13).toFloat + d)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .persist()
    corpus.count()
    val idx = Similarity.buildHierIvfIndex(corpus, "vec_id", "embedding")
    try {
      assert(corpus.storageLevel.useMemory,
        "buildHierIvfIndex evicted the caller's cached corpus")
      val tab = Similarity.buildHierIvfTableIndex(corpus, "vec_id",
        "embedding")
      try assert(corpus.storageLevel.useMemory,
        "buildHierIvfTableIndex evicted the caller's cached corpus")
      finally tab.release()
    } finally { idx.release(); corpus.unpersist() }
  }

  test("kNN join tolerates a null embedding in the indexed corpus") {
    import spark.implicits._
    val good = (0 until 40).map(i => (i.toLong,
      Seq.tabulate(4)(d => (i % 7).toFloat + d * 0.5f)))
    val df = good.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .unionByName(Seq(999L).toDF("vec_id")
        .withColumn("embedding",
          lit(null).cast("array<float>")))
    val idx = Similarity.buildIvfIndex(
      df.filter(col("embedding").isNotNull), "vec_id", "embedding",
      nCells = 4)
    // splice a null-cell member into the built index: the counts pass
    // and the salted join must skip it, not NPE (a null key can never
    // match a probe cell)
    val withNull = idx.copy(assigned = idx.assigned.unionByName(
      df.filter(col("embedding").isNull)
        .select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"),
          lit(null).cast("int").as("cell"))))
    try {
      val out = Similarity.knnJoinIvf(withNull,
        df.filter(col("embedding").isNotNull).limit(8),
        "vec_id", "embedding", k = 3, nprobe = 4)
        .collect()
      assert(out.nonEmpty)
      assert(!out.exists(_.getLong(1) == 999L))
    } finally idx.release()
  }
}
