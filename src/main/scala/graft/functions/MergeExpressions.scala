package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy left-to-right merge of adjacent symbol pairs (a, b) → a+b in
  * an array<string> — the inner loop of BPE vocabulary learning
  * ([[graft.operators.Bpe]]). The `aggregate` HOF formulation
  * evaluates an interpreted lambda per element and rebuilds the
  * accumulator array on every step (O(len²) copies per word, per
  * iteration); this kernel is one linear pass, fully inside
  * whole-stage codegen. Non-overlap semantics match the fold: after a
  * merge the merged token cannot immediately re-merge as the left
  * element of the same pair ("aaa" + (a,a) → ["aa","a"]).
  */
case class MergeAdjacentPair(child: Expression, a: String, b: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_merge_pair"

  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val uab = UTF8String.fromString(a + b)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val x = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (i + 1 < n && x != null && x.equals(ua) && !arr.isNullAt(i + 1) &&
        arr.getUTF8String(i + 1).equals(ub)) {
        out(m) = uab; m += 1; i += 2
      } else {
        out(m) = x; m += 1; i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val uaRef = ctx.addReferenceObj("ua", ua, classOf[UTF8String].getName)
    val ubRef = ctx.addReferenceObj("ub", ub, classOf[UTF8String].getName)
    val uabRef = ctx.addReferenceObj("uab", uab, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val gad = classOf[GenericArrayData].getName
      val utf = classOf[UTF8String].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int $n = $c.numElements();
         |Object[] $out = new Object[$n];
         |int $m = 0;
         |int $i = 0;
         |while ($i < $n) {
         |  $utf $x = $c.isNullAt($i) ? null : $c.getUTF8String($i);
         |  if ($i + 1 < $n && $x != null && $x.equals($uaRef)
         |      && !$c.isNullAt($i + 1)
         |      && $c.getUTF8String($i + 1).equals($ubRef)) {
         |    $out[$m] = $uabRef; $m++; $i += 2;
         |  } else {
         |    $out[$m] = $x; $m++; $i += 1;
         |  }
         |}
         |${ev.value} = new $gad(java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MergeAdjacentPair =
    copy(child = c)
}

object MergeAdjacentPair {
  def merge(sym: Column, a: String, b: String): Column =
    Bridge.column(MergeAdjacentPair(Bridge.expression(sym), a, b))
}
