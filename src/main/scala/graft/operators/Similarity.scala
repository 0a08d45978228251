package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k. The scale-critical part is
  *    the shuffle shape: scoring happens map-side against a BROADCAST
  *    query set, and the per-query top-k is reduced with a bounded-heap
  *    [[TopKAgg]] `Aggregator`, so partial (map-side) aggregation sends
  *    only k candidates per query per partition to the shuffle — never
  *    the full |corpus|×|queries| score matrix. At 100 TB the cost is one
  *    corpus scan + an O(queries·k·partitions) shuffle.
  *  - [[ivfTopK]] — IVF (inverted-file) index: corpus is assigned to
  *    centroid cells once (k-means), queries probe only the `nprobe`
  *    nearest cells; exact cosine within probed cells. The standard
  *    recall/cost dial for embedding search at scale.
  *
  * Cosine is computed with [[Dedup.cosine]]'s strict left-to-right double
  * fold so results are bit-exact reproducible (and oracle-checkable).
  */
object Similarity {

  /** (neighbor id, score) pair carried through the top-k heap. */
  case class Scored(id: Long, score: Double)

  /** Bounded top-k aggregator: keeps the k best (score desc, id asc)
    * pairs. Buffer is a sorted Seq capped at k, so map-side partial
    * aggregation bounds both memory and shuffle volume. Deterministic
    * under any merge order because the comparator is total. */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private val ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.id))
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      ((b :+ a).sorted(ord)).take(k)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      ((a ++ b).sorted(ord)).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Exact cosine top-k of `corpus` for each row of `queries`.
    * Output: (query_id, neighbor_id, rank, cos), rank 1..k by
    * (cos desc, neighbor_id asc); self-matches excluded when ids collide.
    * `queries` must be broadcast-small (the ANN contract). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv")))
    // Repartition the corpus before scoring: a small single-file input
    // would otherwise evaluate every cosine on one task, and at scale
    // this is the knob matching corpus splits to cores.
    val scored = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"))
      .repartition(par)
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Dedup.cosine(col("qv"), col("cv")).as("cos"))
    topKByGroup(scored, k)
  }

  /** Reduce (query_id, neighbor_id, cos) rows to per-query top-k with
    * the native bounded-heap aggregate ([[graft.functions.TopKPairs]],
    * a `TypedImperativeAggregate` — primitive heap buffer, flat-bytes
    * shuffle format) + explode back to ranked rows. */
  private[graft] def topKByGroup(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions
        .topK(col("neighbor_id"), col("cos"), k).as("topk"))
      .select(col("query_id"),
        posexplode(col("topk")).as(Seq("rank0", "n")))
      .select(col("query_id"), col("n.id").as("neighbor_id"),
        (col("rank0") + 1).as("rank"), col("n.score").as("cos"))

  /** `Aggregator`-based formulation of the same top-k (encoder-buffered;
    * kept for differential testing of the native aggregate). */
  private[graft] def topKByGroupUdaf(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = udaf(new TopKAgg(k))
    scored
      .groupBy(col("query_id"))
      .agg(agg(col("neighbor_id"), col("cos")).as("topk"))
      .select(col("query_id"),
        posexplode(col("topk")).as(Seq("rank0", "n")))
      .select(col("query_id"), col("n.id").as("neighbor_id"),
        (col("rank0") + 1).as("rank"), col("n.score").as("cos"))
  }

  /** IVF top-k: corpus bucketed by nearest of `nCells` centroids from
    * the engine-native deterministic [[graft.operators.ML.kmeansLloyd]]
    * index build; each query probes its `nprobe` closest cells and runs
    * exact cosine inside them. Returns the same shape as
    * [[bruteForceTopK]] — approximate: recall < 1 when a true neighbor
    * lives outside the probed cells. `seed` is accepted for API
    * stability but unused (the Lloyd build is deterministic). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              id: String, vec: String, k: Int,
              nCells: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    // Engine-native Lloyd index build (ML.kmeansLloyd): deterministic
    // init, codegen'd assignment, partial-aggregated update — an IVF
    // index needs balanced-ish cells, not converged clusters (recall
    // is governed by nprobe), so 5 iterations suffice and no opaque
    // library sits in the index path.
    val kmResult = graft.operators.ML
      .kmeansLloyd(corpus.select(col(id), col(vec)), vec, id,
        k = nCells, iters = 5)
    val centroidRows = kmResult.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toSeq))
      .sortBy(_._1)
    kmResult.unpersist(false)
    // cell-indexed centroid matrix for the native assignment kernel,
    // and a broadcast-small table for query probing
    val matrix = centroidRows.map(_._2.toArray)
    val centroids = broadcast(
      spark.createDataFrame(centroidRows.toSeq).toDF("cell", "centroid"))

    // assignment = one narrow codegen'd projection (same NearestCell
    // kernel the index build used)
    val assigned = corpus.select(col(id), col(vec))
      .withColumn("cell", graft.functions.VectorFunctions
        .nearestCell(col(vec), matrix))
      .select(col(id).as("neighbor_id"), col(vec).as("cv"), col("cell"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val probes = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .crossJoin(centroids)
      .withColumn("ccos", Dedup.cosine(col("qv"), col("centroid")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))

    val scored = assigned
      .repartition(spark.sparkContext.defaultParallelism, col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Dedup.cosine(col("qv"), col("cv")).as("cos"))
    topKByGroup(scored, k)
  }
}
