package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic hash sampling: reproducibility, partition invariance,
  * approximate rates, split completeness. */
class SamplingSpec extends SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).toDF("id")
  }

  test("hashSample is deterministic and partition-layout invariant") {
    val df = ids(2000)
    def sample(parts: Int) =
      Sampling.hashSample(df.repartition(parts), col("id"), 6554)
        .collect().map(_.getLong(0)).toSet
    val a = sample(1)
    assert(a == sample(7))
    assert(a == sample(3))
    // ~10% within generous bounds
    assert(a.size > 120 && a.size < 280, s"got ${a.size}")
  }

  test("splitColumn partitions every row into exactly one split") {
    val counts = ids(2000)
      .withColumn("split", Sampling.splitColumn(col("id"),
        Seq(("test", 6554), ("val", 13108))))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts.keySet == Set("test", "val", "train"))
    assert(counts("train") > counts("test") && counts("train") > counts("val"))
    // test and val are disjoint hash ranges of equal width
    assert(math.abs(counts("test") - counts("val")) < 150)
  }

  test("num=65536 keeps every row (hex4 5-char edge case)") {
    assert(Sampling.hashSample(ids(500), col("id"), 65536).count() == 500)
    val labels = ids(500)
      .withColumn("split", Sampling.splitColumn(col("id"),
        Seq(("a", 32768), ("all", 65536)), "never"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!labels.contains("never") && labels.values.sum == 500)
  }

  test("sample membership is stable under union with other data") {
    val base = Sampling.hashSample(ids(500), col("id"), 6554)
      .collect().map(_.getLong(0)).toSet
    val wider = Sampling.hashSample(ids(1000), col("id"), 6554)
      .collect().map(_.getLong(0)).toSet
    assert(base.subsetOf(wider))
  }

  test("stratifiedSample keeps per-stratum rates; default drops") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val kept = Sampling.stratifiedSample(df, col("id"), col("s"),
      rates = Seq("a" -> 65536, "b" -> 6554))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // every 'a' row survives; 'b' rows are exactly its hashSample
    assert(kept.count(_._2 == "a") == 500)
    val bIds = kept.filter(_._2 == "b").map(_._1).toSet
    val expectB = Sampling.hashSample(df.filter(col("s") === "b"),
      col("id"), 6554).collect().map(_.getLong(0)).toSet
    assert(bIds == expectB)
    // unknown stratum with defaultNum=0 drops everything
    val dropped = Sampling.stratifiedSample(df, col("id"), col("s"),
      rates = Seq("a" -> 65536)).filter(col("s") === "b").count()
    assert(dropped == 0)
  }

  test("reservoirPerGroup == window-sort reference, partition invariant, no Window in plan") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"g${i % 7}")).toDF("id", "g")
    def picks(d: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      Sampling.reservoirPerGroup(d, col("g"), col("id"), k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = picks(df)
    // reference: smallest (md5-prefix, id) per group via a window sort
    val ref = df
      .withColumn("h", substring(md5(col("id").cast("string")), 1, 12))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("h"), col("id"))))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(got == ref)
    assert(got.size == 35) // exactly k per group
    assert(picks(df.repartition(13)) == got)
    // small groups yield the whole group, not k
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "g")
    assert(picks(tiny) == Set(("x", 1L), ("x", 2L)))
    // the scale contract: a bounded-heap aggregate, not a window sort
    val plan = Sampling.reservoirPerGroup(df, col("g"), col("id"), 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "reservoir must not window-sort groups")
    assert(plan.contains("graft_topk"), "reservoir should use the native top-k aggregate")
  }

  test("dsirWeights ranks target-like docs above off-target docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta alpha beta"),   // target-like
      (2L, "omega sigma tau rho omega sigma"),     // off-target
      (3L, "alpha beta gamma delta"),               // target-like, shorter
      (4L, "one")                                   // <2 tokens → absent
    ).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta gamma delta alpha beta gamma"))
      .toDF("doc_id", "text")
    val w = Sampling.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(!w.contains(4L))
    assert(w(1L)._1 == 5L) // 5 bigrams
    assert(w(1L)._2 > w(2L)._2, "target-like doc must outweigh off-target")
    assert(w(3L)._2 > w(2L)._2)
    // partition invariance (decimal-staged sum is order-free)
    val w13 = Sampling.dsirWeights(corpus.repartition(13), target,
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w13 == w.map { case (k, v) => k -> v._2 })
  }

  /** Independent scalar recomputation of the order-sampling priority. */
  private def refPri(id: Long, w: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    (java.lang.Long.parseLong(hex, 16) * 1048576L) / w
  }

  test("weightedOrderSample == brute-force smallest-k, no Window, partition invariant") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, 1L + i % 17)).toDF("id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedOrderSample(d, col("id"), col("w"), k = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val got = run(df)
    val ref = (1L to 400L).map(i => (i, 1L + i % 17))
      .map { case (i, w) => (i, w, refPri(i, w)) }
      .sortBy(t => (t._3, t._1)).take(25).toSet
    assert(got == ref)
    assert(run(df.repartition(13)) == got)
    val plan = Sampling.weightedOrderSample(df, col("id"), col("w"), 25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "selection must not global-sort")
    assert(plan.contains("graft_topk"))
  }

  test("weightedOrderSample inclusion tracks weight; w<=0 excluded") {
    import spark.implicits._
    // one row carries 10^6× the weight of 999 others: its priority is
    // ~10^6 smaller, so it must be drawn (deterministic given md5)
    val df = ((1L to 999L).map(i => (i, 1L)) :+ (1000L, 1000000L))
      .toDF("id", "w")
    val picked = Sampling.weightedOrderSample(df, col("id"), col("w"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(picked.contains(1000L), "heavy row must be sampled")
    // zero/negative weights can never be drawn
    val withBad = df.union(Seq((2000L, 0L), (2001L, -5L)).toDF("id", "w"))
    val picked2 = Sampling.weightedOrderSample(withBad, col("id"),
      col("w"), 1000).collect().map(_.getLong(0)).toSet
    assert(!picked2.contains(2000L) && !picked2.contains(2001L))
    assert(picked2.size == 1000)
  }

  test("tokenBudgetMix: exact rates, membership, and full-keep strata") {
    import spark.implicits._
    // stratum a: 10 docs × 100 tokens = 1000 ≤ budget → keep all at 65536
    // stratum b: 200 docs × 50 tokens = 10000 > budget 1000 →
    //   num = (65536*1000) div 10000 = 6553
    val rows = (1L to 10L).map(i => (i, "a", 100L)) ++
      (100L until 300L).map(i => (i, "b", 50L))
    val df = rows.toDF("id", "s", "nt")
    val kept = Sampling.tokenBudgetMix(df, col("id"), col("s"), col("nt"),
      budget = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val aKept = kept.filter(_._2 == "a")
    assert(aKept.length == 10 && aKept.forall(_._3 == 65536L))
    val bKept = kept.filter(_._2 == "b")
    assert(bKept.forall(_._3 == 6553L))
    // membership is exactly the 16-bit hash threshold
    val expectB = (100L until 300L).filter { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) < 6553L
    }.toSet
    assert(bKept.map(_._1).toSet == expectB)
    // kept tokens land near the budget in expectation (rate ≈ 10%)
    val bTokens = bKept.length * 50L
    assert(bTokens < 3 * 1000L, s"kept $bTokens tokens for budget 1000")
  }

  test("temperatureMix flattens toward low-resource strata; alpha=1 == tokenBudgetMix") {
    import spark.implicits._
    // big: 400 docs × 50 tok = 20000; small: 20 docs × 50 tok = 1000
    val rows = (1L to 400L).map(i => (i, "big", 50L)) ++
      (1000L until 1020L).map(i => (i, "small", 50L))
    val df = rows.toDF("id", "s", "nt")
    def rates(alphaQ: Int): Map[String, Long] =
      Sampling.temperatureMix(df, col("id"), col("s"), col("nt"),
        budget = 2000L, alphaQuarters = alphaQ)
        .select(col("s"), col("__rate_num")).distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact mirror of the rate arithmetic
    def refNum(t: Double, denom: Double, alphaQ: Int): Long = {
      val ta = alphaQ match {
        case 1 => math.sqrt(math.sqrt(t)); case 2 => math.sqrt(t)
        case 3 => math.sqrt(t) * math.sqrt(math.sqrt(t)); case 4 => t
      }
      math.min(65536L, math.floor(65536.0 * 2000.0 * ta / t / denom).toLong)
    }
    val d05 = math.sqrt(20000.0) + math.sqrt(1000.0)
    val r05 = rates(2)
    assert(r05("big") == refNum(20000.0, d05, 2))
    assert(r05("small") == refNum(1000.0, d05, 2))
    // flattening: the small stratum's keep-RATE exceeds the big one's
    assert(r05("small") > r05("big"))
    // α = 1: share ∝ T, so every stratum gets the SAME uniform rate
    // B/ΣT — proportional allocation is corpus-uniform sampling
    val r1 = rates(4)
    val uniform = math.floor(65536.0 * 2000.0 / 21000.0).toLong
    assert(r1("big") == uniform && r1("small") == uniform)
    // kept-row membership is the u16 threshold of the derived rate
    val kept = Sampling.temperatureMix(df, col("id"), col("s"), col("nt"),
      budget = 2000L, alphaQuarters = 2)
      .collect().map(_.getLong(0)).toSet
    val expect = rows.filter { case (i, s, _) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      java.lang.Long.parseLong(hex, 16) < r05(s)
    }.map(_._1).toSet
    assert(kept == expect)
  }

  test("groupSafeSplit: no group straddles splits; gate keys on the rep") {
    import spark.implicits._
    // 300 groups of size 1–3: id 3g, 3g+1, 3g+2 share group g
    val df = (0L until 900L).map(i => (i, i / 3)).toDF("id", "grp")
    val out = Sampling.groupSafeSplit(df, col("id"), col("grp"),
      Seq(("test", 6554), ("val", 13108))).cache()
    // structural law: a group has exactly one distinct split label
    val straddlers = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddlers == 0)
    // the label is splitColumn of the group's min id — for this layout,
    // every member carries the label its rep (id = 3·grp) would get
    val expected = df.select(col("id"), col("grp"),
      Sampling.splitColumn(col("grp") * 3, Seq(("test", 6554),
        ("val", 13108))).as("want"))
    val diff = out.join(expected, Seq("id", "grp"))
      .filter(col("split") =!= col("want")).count()
    assert(diff == 0)
    // partition-layout invariance (the window keys the shuffle, not
    // the incoming layout)
    val relabeled = Sampling.groupSafeSplit(df.repartition(7), col("id"),
      col("grp"), Seq(("test", 6554), ("val", 13108)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val base = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(relabeled == base)
    out.unpersist()
  }

  test("groupSafeSplit beats row-hash splitting on dup-group leakage") {
    import spark.implicits._
    // every group has 2 members; row-hash splitting straddles some
    val df = (0L until 1000L).map(i => (i, i / 2)).toDF("id", "grp")
    val rowHash = df.withColumn("split", Sampling.splitColumn(col("id"),
      Seq(("holdout", 13108))))
    val leaked = rowHash.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(leaked > 0, "row-hash splitting should straddle some groups " +
      "(or this law is vacuous)")
    val safe = Sampling.groupSafeSplit(df, col("id"), col("grp"),
      Seq(("holdout", 13108)))
      .groupBy("grp").agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(safe == 0)
  }
}
