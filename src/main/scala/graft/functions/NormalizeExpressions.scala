package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static NFC kernel shared by the interpreted and codegen'd paths. */
object NormalizeKernels {
  /** Unicode NFC (canonical composition). Already-NFC inputs (the
    * overwhelming majority of real corpus text) take the
    * `isNormalized` fast path — a pure scan, no allocation. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen'd expression —
  * the canonical first step of a C4/RefinedWeb-style text-cleanup
  * pipeline (decomposed accents, compatibility variants of the same
  * grapheme, and mixed crawls otherwise defeat exact/near dedup:
  * "é" as U+00E9 and as e+U+0301 hash differently). Spark has no
  * built-in for this; a native expression keeps it inside
  * whole-stage codegen in the scan stage. Engine-portable: DuckDB's
  * `nfc_normalize` is the oracle mirror.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeKernels.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NormalizeFunctions {
  /** Column-API entry for [[NfcNormalize]]. */
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** Unicode whitespace (beyond ASCII) as an RE2-and-Java-compatible
    * explicit class: NBSP, OGHAM, en/em-family spaces, line/para
    * separators, narrow NBSP, math space, ideographic space. */
  val unicodeSpaceClass: String =
    "[\\t\\n\\x0B\\f\\r \\x{00A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"

  /** C0/C1 control characters minus the tab/newline family (which the
    * whitespace collapse already owns). */
  val controlClass: String =
    "[\\x00-\\x08\\x0E-\\x1F\\x7F\\x{0080}-\\x{009F}]"

  /** Full cleanup chain: NFC → strip controls → collapse every
    * whitespace run (including exotic Unicode spaces) to one ASCII
    * space → trim. Pure codegen'd scan-stage work, no shuffle; both
    * regexes are RE2-compatible so the DuckDB oracle applies the
    * identical patterns (see [[cleanupSqlDuck]]). */
  def cleanup(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfc(c), controlClass, ""),
      unicodeSpaceClass + "+", " "))

  /** DuckDB mirror of [[cleanup]] over SQL expression `e`. */
  def cleanupSqlDuck(e: String): String =
    "trim(regexp_replace(regexp_replace(nfc_normalize(" + e +
      "), '" + controlClass + "', '', 'g'), '" +
      unicodeSpaceClass + "+', ' ', 'g'))"
}
