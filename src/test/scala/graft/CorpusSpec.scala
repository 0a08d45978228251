package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Snapshot}

/** Context-window chunking, sequence packing, and CDC compaction/diff:
  * hand-computed goldens plus the invariants that must survive scale
  * (coverage/overlap laws, partition invariance, packing conservation).
  */
class CorpusSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g"),     // 7 tokens
      (2L, "h i j"),             // 3 tokens
      (3L, "k"),                 // 1 token
      (4L, "l m n o p q r s t")  // 9 tokens
    ).toDF("doc_id", "text")
  }

  test("chunkByTokens golden: size 4 stride 3, short tail kept") {
    val rows = Chunking.chunkByTokens(docs, "doc_id", "text", 4, 3)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    assert(rows.toSeq == Seq(
      (1L, 0, 0, 4, "a b c d"),
      (1L, 1, 3, 4, "d e f g"),
      (1L, 2, 6, 1, "g"),
      (2L, 0, 0, 3, "h i j"),
      (3L, 0, 0, 1, "k"),
      (4L, 0, 0, 4, "l m n o"),
      (4L, 1, 3, 4, "o p q r"),
      (4L, 2, 6, 3, "r s t")))
  }

  test("chunkByTokens with stride == size covers each token exactly once") {
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", 3, 3)
    val perDoc = out.groupBy("doc_id")
      .agg(sum("n_tokens").as("covered")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(1L -> 7L, 2L -> 3L, 3L -> 1L, 4L -> 9L))
  }

  test("packAssignments golden: spans, bins, and conservation") {
    // doc order 1..4, token counts 7,3,1,9; ctx=8:
    //   doc1 [0,7)  bins 0..0 | doc2 [7,10) bins 0..1 (split)
    //   doc3 [10,11) bin 1    | doc4 [11,20) bins 1..2 (split)
    val rows = Chunking.packAssignments(docs, "doc_id", "text", 8)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.toSeq == Seq(
      (1L, 7L, 0L, 7L, 0L, 0L, 1L),
      (2L, 3L, 7L, 10L, 0L, 1L, 2L),
      (3L, 1L, 10L, 11L, 1L, 1L, 1L),
      (4L, 9L, 11L, 20L, 1L, 2L, 2L)))
    // conservation: spans tile [0, total) with no gap or overlap
    val total = rows.map(_._2).sum
    assert(rows.map(r => r._4 - r._3).sum == total)
    assert(rows.sortBy(_._3).sliding(2).forall {
      case Array(a, b) => a._4 == b._3
      case _           => true
    })
  }

  test("packAssignments is partition-layout invariant") {
    val base = Chunking.packAssignments(docs, "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    val repart = Chunking.packAssignments(
      docs.repartition(5), "doc_id", "text", 8)
      .collect().map(_.toSeq).toSet
    assert(base == repart)
  }

  private def log = {
    import spark.implicits._
    Seq(
      (1L, 100L, 10L, "a", 1.0),
      (2L, 200L, 10L, "b", 2.0),   // latest for key 10 (version 200)
      (3L, 200L, 10L, "c", 3.0),   // same version, higher tiebreak wins
      (4L, 100L, 20L, "d", 4.0),
      (5L, 50L, 30L, "e", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("latestByKey picks max version with tiebreak, partial-agg shape") {
    val out = Snapshot.latestByKey(log, col("user_id"), col("ts"),
      col("event_id"), Seq("event_id", "event_type", "value"))
    val rows = out.orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (10L, 3L, "c", 3.0), (20L, 4L, "d", 4.0), (30L, 5L, "e", 5.0)))
    // scale shape: an aggregate (partial-combinable), not a window sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected aggregate-based compaction, got:\n$plan")
    assert(!plan.contains("Window"), "compaction must not use a window sort")
  }

  test("scd2History assigns contiguous validity intervals per key") {
    val rows = Snapshot.scd2History(log, col("user_id"), col("ts"),
      col("event_id"), col("value"))
      .orderBy("key", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.toSeq == Seq(
      (10L, 100L, 1.0, 200L, 0),
      (10L, 200L, 2.0, 200L, 0),  // same-version records chain by tiebreak
      (10L, 200L, 3.0, -1L, 1),
      (20L, 100L, 4.0, -1L, 1),
      (30L, 50L, 5.0, -1L, 1)))
    // exactly one current row per key
    assert(rows.filter(_._5 == 1).map(_._1).toSeq.sorted == Seq(10L, 20L, 30L))
  }

  test("mergeAggStates is split-point invariant (any delta cut, same state)") {
    import spark.implicits._
    import graft.operators.Incremental
    val rows = (1L to 300L).map(i => (i % 7, i.toDouble, i))
      .toDF("k", "v", "t")
    def st(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("s"),
        min("t").as("lo"), max("t").as("hi"))
    def merged(cut: Long) = Incremental.mergeAggStates(
      st(rows.filter(col("t") < cut)), st(rows.filter(col("t") >= cut)),
      Seq("k"), Seq("n", "s"), Seq("lo"), Seq("hi"))
      .collect().map(_.toSeq).toSet
    val full = st(rows).collect().map(_.toSeq).toSet
    assert(merged(150) == full)
    assert(merged(17) == full)
  }

  test("snapshotDiff classifies added/changed and drops unchanged") {
    // cut 150: state {10->a(v100), 20->d, 30->e}; cut 300: {10->c, 20->d, 30->e}
    val out = Snapshot.snapshotDiff(log, col("user_id"), col("ts"),
      col("event_id"), col("value"), lit(150L), lit(300L))
      .orderBy("key").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(out.toSeq == Seq((10L, "changed")))
    // disjoint cuts: everything in the new snapshot is "added"
    val added = Snapshot.snapshotDiff(log, col("user_id"), col("ts"),
      col("event_id"), col("value"), lit(0L), lit(300L))
      .collect().map(r => r.getString(3)).toSet
    assert(added == Set("added"))
  }
}
