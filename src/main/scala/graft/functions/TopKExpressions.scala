package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType,
  StructField, StructType}

/** Bounded top-k (id, score) aggregate as a native
  * `TypedImperativeAggregate` — the custom-aggregate class SURVEY §7
  * flags for sketch/top-k operators. Replaces the `Aggregator`-based
  * UDAF whose Seq buffer round-trips through an `ExpressionEncoder` on
  * every update/merge; here the buffer is a primitive bounded heap and
  * (de)serialization is a flat 16-byte-per-entry buffer, so map-side
  * partial aggregation stays allocation-light. Shuffle volume is
  * unchanged (k entries per group per partition) — this trims CPU, the
  * distributed shape was already right.
  *
  * Ranking: best = highest score, ties broken by smaller id. Output:
  * array<struct<id:bigint, score:double>> sorted best-first. Null ids
  * or scores are skipped.
  */
case class TopKPairs(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && scoreExpr.dataType == DoubleType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, double) and k > 0")

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      buf.offer(id.asInstanceOf[Long], score.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach((i, s) => buf.offer(i, s))
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedBestFirst()
    new GenericArrayData(sorted.map { case (i, s) =>
      val row = new GenericInternalRow(2)
      row.setLong(0, i)
      row.setDouble(1, s)
      row: Any
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKPairs =
    copy(idExpr = c(0), scoreExpr = c(1))
}

/** Primitive bounded heap of (id, score), worst entry at the root so a
  * full heap evicts in O(log k). "Better" = higher score, then lower id. */
final class TopKHeap(k: Int) {
  private val ids = new Array[Long](k)
  private val scores = new Array[Double](k)
  private var n = 0

  // a is WORSE than b (a should sit closer to the root)
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def offer(id: Long, score: Double): Unit = {
    if (n < k) {
      var i = n
      ids(i) = id; scores(i) = score; n += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      ids(0) = id; scores(0) = score
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def foreach(f: (Long, Double) => Unit): Unit = {
    var i = 0
    while (i < n) { f(ids(i), scores(i)); i += 1 }
  }

  def sortedBestFirst(): Array[(Long, Double)] = {
    val out = Array.tabulate(n)(i => (ids(i), scores(i)))
    out.sortBy { case (i, s) => (-s, i) }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < m) { h.offer(bb.getLong, bb.getDouble); i += 1 }
    h
  }
}

object TopKFunctions {
  /** Aggregate Column: top-k (id, score) pairs, best first. */
  def topK(id: Column, score: Column, k: Int): Column =
    Bridge.column(TopKPairs(Bridge.expression(id),
      Bridge.expression(score), k).toAggregateExpression())
}
