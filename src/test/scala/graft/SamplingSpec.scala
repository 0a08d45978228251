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
}
