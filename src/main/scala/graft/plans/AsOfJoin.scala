package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  BindReferences,
  Expression,
  GenericInternalRow,
  JoinedRow,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.Bridge

/** AS-OF JOIN — an operator Spark lacks as a first-class node (SURVEY §7
  * custom-operator ladder, rung (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Semantics (= DuckDB `ASOF LEFT JOIN ... ON l.by = r.by AND l.on >=
  * r.on`): for every left row, attach the right row with the same `by`
  * key and the greatest `on` value ≤ the left row's `on`; null-extend
  * when none exists.
  *
  * Scale shape: both sides hash-cluster on `by` and sort by (by, on) —
  * declared via requiredChildDistribution/Ordering so EnsureRequirements
  * plans the exchanges exactly like a sort-merge join — then a
  * two-pointer merge streams each partition pair with O(1) state (one
  * buffered right row). 100 TB events join like any SMJ: one shuffle per
  * side, no buffering of groups.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Attribute,
    rightBy: Attribute,
    leftOn: Attribute,
    rightOn: Attribute,
    rightTie: Option[Attribute]
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom operator (the Rule rung of the
  * custom-operator ladder): a Filter above an AsOfJoin whose predicates
  * only reference LEFT columns commutes with the join — every output row
  * corresponds to exactly one left row — so those conjuncts push below
  * the join and can reach the left scan (Catalyst's built-in pushdown
  * rules don't know the node). Right-side/mixed conjuncts stay above
  * (right columns are null-extended, so they do not commute).
  */
object AsOfJoinPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      // only the deterministic PREFIX may move (same span convention as
      // Catalyst's PushPredicateThroughJoin): pushing a deterministic
      // conjunct written after a rand() would change how many rows the
      // rand() evaluates over
      val (candidates, rest) = splitConjunctivePredicates(cond).span(_.deterministic)
      val (push, keepRefs) = candidates.partition(_.references.subsetOf(j.left.outputSet))
      val keep = keepRefs ++ rest
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lBy, rBy, lOn, rOn, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lBy, rBy, lOn, rOn, tie) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join. Key types are generic: comparisons go through the
  * interpreted orderings of the key data types (any ordered type — long,
  * timestamp, string, decimal — works; no casts).
  *
  * Tie rule: among right rows sharing the same (by, on) pair the row
  * sorting LAST under `rightTie` ascending wins — deterministic across
  * runs when a tie key is supplied (without one, ties fall back to
  * whatever order the sort produced, which Spark does not pin).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftBy: Expression,
    rightBy: Expression,
    leftOn: Expression,
    rightOn: Expression,
    rightTie: Option[Expression]
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge streams left rows in order, so the left sort survives —
  // declaring it lets downstream sorts on (by, on) be elided
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftBy)), ClusteredDistribution(Seq(rightBy)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending)),
      Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending)) ++
        rightTie.map(SortOrder(_, Ascending))
    )

  override protected def doExecute(): RDD[InternalRow] = {
    val lByB = BindReferences.bindReference(leftBy, left.output)
    val lOnB = BindReferences.bindReference(leftOn, left.output)
    val rByB = BindReferences.bindReference(rightBy, right.output)
    val rOnB = BindReferences.bindReference(rightOn, right.output)
    val byOrd = TypeUtils.getInterpretedOrdering(leftBy.dataType)
    val onOrd = TypeUtils.getInterpretedOrdering(leftOn.dataType)
    val rightWidth = right.output.size
    val allOutput = output

    // the projection's input schema must mark right columns nullable even
    // when the child declares them non-nullable — null-extension writes
    // nulls into those slots, and a non-nullable BoundReference would
    // read them as 0/false instead of null
    val projInput = left.output ++ right.output.map(_.withNullability(true))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(allOutput, projInput)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      // candidate = latest right row seen with (by == current left by,
      // on <= current left on); reset when the by-key advances. candBy is
      // re-evaluated from the COPIED row so it never aliases the mutable
      // scan buffer.
      var candBy: Any = null
      var cand: InternalRow = null

      lIter.map { lRow =>
        val lByV = lByB.eval(lRow)
        val lOnV = lOnB.eval(lRow)
        if (lByV == null || lOnV == null) {
          proj(joined(lRow, nullRight))
        } else {
          if (cand != null && byOrd.compare(candBy, lByV) != 0) { cand = null; candBy = null }
          // advance the right side up to (lByV, lOnV)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rByV = rByB.eval(head)
            val rOnV = rOnB.eval(head)
            if (rByV == null || rOnV == null) { rBuf.next() } // unmatched key rows
            else {
              val byCmp = byOrd.compare(rByV, lByV)
              if (byCmp < 0) rBuf.next()
              else if (byCmp == 0 && onOrd.compare(rOnV, lOnV) <= 0) {
                cand = rBuf.next().copy()
                candBy = rByB.eval(cand)
              } else advancing = false
            }
          }
          if (cand != null) proj(joined(lRow, cand))
          else proj(joined(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the custom operator. */
object AsOf {

  /** As-of (backward) left join: both inputs must expose `by` and `on`
    * columns by name (any ordered data type); right columns must not
    * clash with left's (pre-rename them). `rightTieCol`, when given,
    * makes the pick among right rows with identical (by, on) keys
    * deterministic (the row with the greatest tie value wins). Registers
    * the planner strategy on the session lazily.
    */
  def joinAsOf(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftByCol: String,
      rightByCol: String,
      leftOnCol: String,
      rightOnCol: String,
      rightTieCol: Option[String] = None
  ): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinPushdown
    }
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(s"no column $name"))
    Bridge.ofRows(
      spark,
      AsOfJoin(
        lp,
        rp,
        attr(lp, leftByCol),
        attr(rp, rightByCol),
        attr(lp, leftOnCol),
        attr(rp, rightOnCol),
        rightTieCol.map(attr(rp, _))
      )
    )
  }
}
