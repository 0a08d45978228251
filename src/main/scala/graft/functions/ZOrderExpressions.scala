package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) curve key: interleaves the low 31 bits of two
  * non-negative integer dimensions — x on even bit positions, y on odd
  * — into one long. Sorting or range-partitioning on the key clusters
  * rows that are close in BOTH dimensions into the same output files,
  * so per-file min/max statistics prune scans filtered on either
  * dimension (the multi-dimensional generalization of sort-by-one-
  * column layout; what lakehouse engines call Z-ORDER clustering).
  * Negative inputs are rejected by the interleave's domain check at
  * eval time (they would wrap and break locality silently).
  *
  * The interleave is the 5-step magic-mask bit spread — O(1), branch-
  * free, fully inside whole-stage codegen; the layout pass costs one
  * sort of the write set, nothing at read time.
  */
case class ZOrderKey(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two int/long dimensions")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  private def asLong(v: Any): Long = v match {
    case i: Int  => i.toLong
    case l: Long => l
  }

  override protected def nullSafeEval(x: Any, y: Any): Any = {
    val xv = asLong(x); val yv = asLong(y)
    if (xv < 0 || xv > ZOrderKey.MaxDim || yv < 0 || yv > ZOrderKey.MaxDim)
      throw new IllegalArgumentException(
        s"$prettyName dimensions must be in [0, 2^31): got ($xv, $yv)")
    ZOrderKey.spread(xv) | (ZOrderKey.spread(yv) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val z = classOf[ZOrderKey].getName + "$.MODULE$"
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |long $xv = (long) $x;
         |long $yv = (long) $y;
         |if ($xv < 0L || $xv > ${ZOrderKey.MaxDim}L ||
         |    $yv < 0L || $yv > ${ZOrderKey.MaxDim}L) {
         |  throw new IllegalArgumentException(
         |    "graft_zorder dimensions must be in [0, 2^31)");
         |}
         |${ev.value} = $z.spread($xv) | ($z.spread($yv) << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrderKey = copy(left = l, right = r)
}

object ZOrderKey {
  val MaxDim: Long = (1L << 31) - 1

  /** Spread the low 31 bits of `v` to even bit positions (0,2,4,…). */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Column-API surface. */
  def zorder(x: Column, y: Column): Column =
    Bridge.column(ZOrderKey(Bridge.expression(x), Bridge.expression(y)))

  /** DuckDB mirror of the key: Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<2i+1 —
    * bit-by-bit, slow but exact; for oracle use only. */
  def zorderSql(x: String, y: String): String = {
    val terms = (0 until 31).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }
    s"(${terms.mkString(" | ")})"
  }
}
