package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static deflate kernel shared by the interpreted and codegen'd paths
  * (Scala object = static forwarders callable from generated Java). */
object TextKernels {
  /** compressed/raw length ratio at a FIXED deflate level, so the
    * result is deterministic for a given input. Empty input → 1.0. */
  def deflateRatio(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / bytes.length
  }

  def deflateRatio(s: UTF8String): Double = deflateRatio(s.getBytes)
}

/** Compression-ratio quality signal: deflate(text).length / length.
  * Low ratio = highly repetitive content (boilerplate, generated spam,
  * degenerate repetition) — the standard cheap junk detector in
  * training-data pipelines, complementing the token-level
  * [[Text.qualityScore]] heuristics. Runs inside whole-stage codegen;
  * the deflate itself dominates, so cost is O(bytes) in the scan
  * stage. Not SQL-oracle-expressible (no zlib in SQL) → spec-covered.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string or binary, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => TextKernels.deflateRatio(s)
    case b: Array[Byte] => TextKernels.deflateRatio(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // overload resolution picks the UTF8String or byte[] kernel
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.deflateRatio($c)")

  override protected def withNewChildInternal(c: Expression): CompressionRatio =
    copy(child = c)
}

object CompressionFunctions {
  /** Column-API entry for [[CompressionRatio]]. */
  def deflateRatio(c: Column): Column =
    Bridge.column(CompressionRatio(Bridge.expression(c)))
}
