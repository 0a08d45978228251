package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute,
  AttributeReference, AttributeSet, Expression, JoinedRow, PredicateHelper,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter,
  LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator Catalyst extension: a native backward as-of join —
  * logical plan + optimizer rule + planner strategy + physical
  * sort-merge operator, wired through `SparkSessionExtensions`
  * ([[GraftExtensions]]). This is the (c)-tier extension path of the
  * build plan: an operator Spark's built-ins can't express as a single
  * physical node.
  *
  * Semantics (identical to the compositional
  * [[graft.operators.Series.asofJoin]], differentially tested): for
  * every left row, the single most recent right row of the same `key`
  * with right.`time` ≤ left.`time`; ties on time resolved to the last
  * right row in (time, payload…) order; unmatched left rows keep null
  * payload columns.
  *
  * Physical shape — the plan a dedicated engine would pick: both sides
  * hash-shuffled on `key` (ClusteredDistribution, so EnsureRequirements
  * co-partitions them), sorted within partitions by (key, time [,
  * payload…]), then ONE streaming per-partition merge with O(1) carried
  * state (the current match) — cost = shuffle(L+R) + sort, no candidate
  * pairs ever materialize, exactly like a sort-merge join. The
  * compositional version pays the same shuffle but unions both sides
  * into one window pass; this operator keeps the sides separate, emits
  * left rows only (no post-filter), and needs no struct packing.
  *
  * The node carries column NAMES, not attribute references, so a
  * self-join of one source (both children sharing expr-ids) needs no
  * dedup pass; each side resolves its own names at execution.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    key: String, time: String, payload: Seq[String],
    payloadOut: Seq[AttributeReference]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  // payloadOut attrs originate here, not from the children.
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  // The node resolves child columns by NAME at execution, so its
  // expression set is empty — declare the real dependencies here or
  // ColumnPruning would strip key/time/payload out of the children.
  @transient override lazy val references: AttributeSet = AttributeSet(
    left.output ++ right.output.filter(a =>
      a.name == key || a.name == time || payload.contains(a.name)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** As-of join `left` to `right` on `key` within `time` order; matched
    * right columns (`time` plus `payload`) come back as
    * `prefix<col>`, null where no right row precedes. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val l = Bridge.analyzed(left)
    val r = Bridge.analyzed(right)
    val fields = (time +: payload).distinct
    def has(p: LogicalPlan, n: String) = p.output.exists(_.name == n)
    require(has(l, key) && has(l, time), s"left needs columns $key, $time")
    require(fields.forall(has(r, _)) && has(r, key),
      s"right needs columns $key, ${fields.mkString(", ")}")
    val payloadOut = fields.map { f =>
      val a = r.output.find(_.name == f).get
      AttributeReference(s"$prefix$f", a.dataType, nullable = true)()
    }
    Bridge.ofRows(left.sparkSession,
      AsOfJoinPlan(l, r, key, time, fields, payloadOut))
  }
}

/** Predicate pushdown through [[AsOfJoinPlan]] — the custom-node analog
  * of Catalyst's PushPredicateThroughJoin (and of the reference's own
  * push-filter rewrite, /root/reference/src/datatable-pass.jl:329-502):
  * conjuncts that reference only left-side columns move below the join,
  * where they can keep descending toward the scan. Only the left side
  * is eligible — dropping right rows early would change which row is
  * "most recent" only if it dropped matches, and a left-only predicate
  * never references right columns, while payload-column predicates stay
  * above (null semantics). */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic &&
          c.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, key, time, payload, payloadOut) =>
      AsOfJoinExec(key, time, payload, payloadOut,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: co-partitioned, sorted children, one
  * streaming merge per partition carrying only the current best match —
  * O(|L|+|R|) per partition, O(1) state. */
case class AsOfJoinExec(
    key: String, time: String, payload: Seq[String],
    payloadOut: Seq[AttributeReference],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def attrOf(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"as-of join: missing column $name"))

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(attrOf(left, key))) ::
      ClusteredDistribution(Seq(attrOf(right, key))) :: Nil

  // Right side additionally ordered by the payload columns so equal-time
  // ties deterministically resolve to the last row in payload order
  // (mirrors the compositional version's last(struct) semantics).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attrOf(left, key), Ascending),
      SortOrder(attrOf(left, time), Ascending)),
    (Seq(attrOf(right, key), attrOf(right, time)) ++
      payload.filterNot(_ == time).map(attrOf(right, _)))
      .map(SortOrder(_, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.name == key)
    val lTimeIdx = lOut.indexWhere(_.name == time)
    val rKeyIdx = rOut.indexWhere(_.name == key)
    val rTimeIdx = rOut.indexWhere(_.name == time)
    val keyType = lOut(lKeyIdx).dataType
    val timeType = lOut(lTimeIdx).dataType
    val payloadAttrs = payload.map(p => rOut(rOut.indexWhere(_.name == p)))
    val outAttrs = output
    val nPay = payloadAttrs.size

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val payProj = UnsafeProjection.create(
        payloadAttrs.asInstanceOf[Seq[Expression]], rOut)
      val resultProj = UnsafeProjection.create(
        outAttrs.asInstanceOf[Seq[Expression]], outAttrs)
      val joined = new JoinedRow
      val nullPay = InternalRow.fromSeq(Seq.fill[Any](nPay)(null))

      var rRow: InternalRow = if (ri.hasNext) ri.next() else null
      var curMatch: UnsafeRow = null
      var curMatchKey: Any = null

      li.map { lr =>
        val lk = lr.get(lKeyIdx, keyType)
        val lt = lr.get(lTimeIdx, timeType)
        if (lk != null && lt != null) {
          // Consume right rows up to (key, time]; remember the last
          // same-key one — sorted input makes it the best match.
          var advancing = true
          while (advancing && rRow != null) {
            val rk = rRow.get(rKeyIdx, keyType)
            val consume =
              if (rk == null) true // nulls-first: never joinable, skip
              else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) true
                else if (c > 0) false
                else {
                  val rt = rRow.get(rTimeIdx, timeType)
                  if (rt == null) true
                  else if (timeOrd.compare(rt, lt) <= 0) {
                    curMatch = payProj(rRow).copy()
                    // rk may point into a reused row buffer (UTF8String /
                    // binary / decimal): copy, or the next right row
                    // silently rewrites the cached key.
                    curMatchKey = InternalRow.copyValue(rk)
                    true
                  } else false
                }
              }
            if (consume) rRow = if (ri.hasNext) ri.next() else null
            else advancing = false
          }
          if (curMatchKey != null && keyOrd.compare(curMatchKey, lk) == 0)
            resultProj(joined(lr, curMatch))
          else resultProj(joined(lr, nullPay))
        } else resultProj(joined(lr, nullPay))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
