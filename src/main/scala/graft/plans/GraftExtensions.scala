package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CompressionRatio, CosineSimilarity,
  MergeAdjacentPair, MinHashSignature, NfcNormalize, Phash64,
  SimHashChunks, SquaredDistance, TokenShingles, WinnowFingerprints,
  ZOrderKey}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions (so `spark.sql("... graft_cosine(a,b)
  * ...")` works next to the Column API), the [[AsOfJoinPlan]] planner
  * strategy, and the [[PushFilterThroughAsOfJoin]] optimizer rule.
  * Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Fail with a clear message (not an IndexOutOfBoundsException from
    * `children(i)`) when a SQL call passes the wrong argument count. */
  private def arity(children: Seq[Expression], n: Int,
                    fn: String): Seq[Expression] = {
    require(children.length == n,
      s"$fn expects $n arguments, got ${children.length}")
    children
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects a literal int argument")
  }

  private def strArg(e: Expression, fn: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
      v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case _ => throw new IllegalArgumentException(
      s"$fn expects a literal string argument")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) =>
        MinHashSignature(children.head, intArg(children(1), "graft_minhash"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashChunks].getName, "graft_simhash"),
      (children: Seq[Expression]) =>
        SimHashChunks(children.head, intArg(children(1), "graft_simhash"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "graft_sqdist"),
      (children: Seq[Expression]) =>
        SquaredDistance(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_ratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName,
        "graft_deflate_ratio"),
      (children: Seq[Expression]) => CompressionRatio(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_merge_pair"),
      new ExpressionInfo(classOf[MergeAdjacentPair].getName,
        "graft_merge_pair"),
      (children: Seq[Expression]) =>
        MergeAdjacentPair(children.head,
          strArg(children(1), "graft_merge_pair"),
          strArg(children(2), "graft_merge_pair"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_phash64"),
      new ExpressionInfo(classOf[Phash64].getName, "graft_phash64"),
      (children: Seq[Expression]) => Phash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_token_shingles"),
      new ExpressionInfo(classOf[TokenShingles].getName,
        "graft_token_shingles"),
      (children: Seq[Expression]) => {
        val cs = arity(children, 2, "graft_token_shingles")
        TokenShingles(cs.head, intArg(cs(1), "graft_token_shingles"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow_fps"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "graft_winnow_fps"),
      (children: Seq[Expression]) =>
        WinnowFingerprints(children.head,
          intArg(children(1), "graft_winnow_fps"),
          intArg(children(2), "graft_winnow_fps"))))
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "graft_zorder"),
      (children: Seq[Expression]) =>
        ZOrderKey(children.head, children(1))))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => StripVectorCasts)
  }
}
