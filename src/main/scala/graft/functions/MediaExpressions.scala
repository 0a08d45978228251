package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import graft.operators.MediaCodec

/** Static media kernels shared by the interpreted and codegen'd paths
  * (Scala object = static forwarders callable from generated Java). */
object MediaKernels {

  /** 64-bit perceptual hash (average hash) over REAL decoded pixels:
    * decode the payload, grayscale each pixel as the channel sum
    * r+g+b, pool into the 8×8 grid (source (x, y) → cell
    * (x·8 ÷ w, y·8 ÷ h)), and set bit j = row·8 + col iff that cell's
    * mean exceeds the global mean. The mean comparison is exact
    * integer cross-multiplication (cellSum·totalCount >
    * totalSum·cellCount), so every bit is deterministic and
    * SQL-replayable — no float thresholds. */
  def phash64(bytes: Array[Byte]): Long = {
    val (w, h, rgb) = MediaCodec.decodeRgb(bytes)
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val k = (y * w + x) * 3
        val s = (rgb(k) & 0xFF) + (rgb(k + 1) & 0xFF) + (rgb(k + 2) & 0xFF)
        val j = by * 8 + x * 8 / w
        sums(j) += s
        cnts(j) += 1
        total += s
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var out = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) * n > total * cnts(j)) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Native perceptual-hash expression: decode + grayscale + 8×8 pool +
  * threshold in ONE generated-code call — no ScalaUDF
  * encoder/deserializer round-trip on the (potentially large) binary
  * payload. The image near-dup scan-stage kernel ([[MediaKernels
  * .phash64]]); `graft_phash64` in SQL. Cost is O(payload bytes) in
  * the scan stage; the 8-byte hash is all that survives into any
  * downstream shuffle. */
case class Phash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash64"

  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.phash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MediaKernels.phash64($c)")

  override protected def withNewChildInternal(c: Expression): Phash64 =
    copy(child = c)
}

object MediaFunctions {
  /** Column-API entry for [[Phash64]]. */
  def phash64(c: Column): Column =
    Bridge.column(Phash64(Bridge.expression(c)))
}
