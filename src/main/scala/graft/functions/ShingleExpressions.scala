package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static shingle kernel shared by the interpreted and codegen'd
  * paths. */
object ShingleKernels {
  private val Sep = UTF8String.fromString(" ")

  /** Word k-shingles of a token array: element i is
    * `tokens[i..i+k-1]` joined with a single space (null tokens
    * skipped — `concat_ws` semantics, matching the HOF formulation
    * this kernel replaced). `n < k` → empty array. One tight loop,
    * one small buffer per shingle — no lambda frames, no slice
    * allocations. */
  def tokenShingles(ts: ArrayData, k: Int): ArrayData = {
    val n = ts.numElements()
    if (n < k) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) {
          if (!ts.isNullAt(i + j)) parts(j) = ts.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Word k-shingling as a native codegen'd expression. The previous
  * formulation — `transform(sequence(0, n-k), i => concat_ws(" ",
  * slice(ts, i+1, k)))` — computes the same shingles, but Catalyst
  * interprets higher-order-function lambdas: per SHINGLE it paid a
  * lambda frame, a slice array allocation, and an interpreted
  * concat_ws (the r6 text/sampling scale probes measured the bare
  * bigram explode of a 500k-doc corpus at ~49 s; this kernel is one
  * static call per row). Shingling feeds most of the text surface —
  * MinHash/n-gram/winnow dedup, dup-spans, decontamination, BPE pair
  * counts, the bigram/trigram LMs, and DSIR — so it must live inside
  * whole-stage codegen like the probe-cell and cosine kernels.
  */
case class TokenShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects k >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_token_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.tokenShingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.tokenShingles($c, $k)")

  override protected def withNewChildInternal(c: Expression): TokenShingles =
    copy(child = c)
}

object ShingleFunctions {
  /** Column-API entry for [[TokenShingles]]. */
  def tokenShingles(ts: Column, k: Int): Column =
    Bridge.column(TokenShingles(Bridge.expression(ts), k))
}
