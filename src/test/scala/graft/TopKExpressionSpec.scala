package graft

import org.apache.spark.sql.functions._

import graft.functions.{TopKFunctions, TopKHeap}
import graft.operators.Similarity

/** Native TopKPairs aggregate: heap unit behavior, differential
  * agreement with the Aggregator-based UDAF, serialization round-trip
  * through a real shuffle. */
class TopKExpressionSpec extends SparkSpec {

  test("heap keeps the k best with (score desc, id asc) ranking") {
    val h = new TopKHeap(3)
    Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (4L, 0.9), (5L, 0.7))
      .foreach { case (i, s) => h.offer(i, s) }
    // ties on 0.9 → smaller id first; 0.1 and 0.5 evicted
    assert(h.sortedBestFirst().toSeq == Seq((2L, 0.9), (4L, 0.9), (5L, 0.7)))
    // serialization round-trip preserves contents
    val back = TopKHeap.fromBytes(3, h.toBytes)
    assert(back.sortedBestFirst().toSeq == h.sortedBestFirst().toSeq)
  }

  test("native aggregate equals the Aggregator UDAF across partitions") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val scored = (1 to 500).map { i =>
      (i.toLong % 13, i.toLong, math.floor(rng.nextDouble() * 20) / 20.0)
    }.toDF("query_id", "neighbor_id", "cos").repartition(7)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val native = rows(Similarity.topKByGroup(scored, 5))
    val udafR = rows(Similarity.topKByGroupUdaf(scored, 5))
    assert(native == udafR)
    // exactly 5 per query, ranks 1..5
    assert(native.groupBy(_.head).forall(_._2.size == 5))
  }

  test("k larger than the group yields the whole group, ranked") {
    import spark.implicits._
    val scored = Seq((1L, 10L, 0.3), (1L, 11L, 0.8))
      .toDF("query_id", "neighbor_id", "cos")
    val got = Similarity.topKByGroup(scored, 9)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((11L, 1), (10L, 2)))
  }
}
