package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule rewriting the per-group top-k window idiom
  *
  *   Filter(row_number() OVER (PARTITION BY g ORDER BY o) <= k)
  *
  * into the bounded-heap [[TopKPerGroup]] operator. The window plan
  * shuffles every row and FULLY SORTS each group only to discard all but
  * k rows; the rewritten plan prunes to ≤ k rows per group on the map
  * side before the exchange and never sorts a whole group.
  *
  * Guarded to exact row_number semantics: single window expression,
  * default (UNBOUNDED PRECEDING → CURRENT ROW) row frame, non-empty
  * partition spec, and a rank bound conjunct of shape rn <= k / rn < k /
  * rn = 1 (possibly through an integral cast). Other conjuncts are kept
  * in a Filter above the rewrite. Cardinality and rank values are
  * identical: both keep exactly min(k, |group|) rows ranked 1..k in sort
  * order (ties arbitrary in both, deterministic when the order is
  * total — same contract as row_number itself).
  *
  * Registered via [[graft.GraftExtensions]] (injectOptimizerRule) so it
  * runs inside the fixed-point operator-optimization batch, after
  * project collapse and predicate pushdown have brought the Filter
  * adjacent to the Window.
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** k such that `e` ⟺ rank ≤ k, seeing through integral casts. */
  private def rankBound(e: Expression, rn: Attribute): Option[Int] = {
    def isRn(x: Expression): Boolean = x match {
      case a: Attribute => a.exprId == rn.exprId
      case c: Cast => isRn(c.child)
      case _ => false
    }
    def intOf(l: Literal): Option[Int] = l.value match {
      case i: Int => Some(i)
      case j: Long if j.isValidInt => Some(j.toInt)
      case s: Short => Some(s.toInt)
      case _ => None
    }
    e match {
      case LessThanOrEqual(a, l: Literal) if isRn(a) => intOf(l)
      case LessThan(a, l: Literal) if isRn(a) => intOf(l).map(_ - 1)
      case GreaterThanOrEqual(l: Literal, a) if isRn(a) => intOf(l)
      case GreaterThan(l: Literal, a) if isRn(a) => intOf(l).map(_ - 1)
      case EqualTo(a, l: Literal) if isRn(a) && intOf(l).contains(1) => Some(1)
      case EqualTo(l: Literal, a) if isRn(a) && intOf(l).contains(1) => Some(1)
      case _ => None
    }
  }

  /** Rewrite only for genuinely small k: the bounded heap holds k row
    * copies per group with NO spill, so a huge bound (a de-facto
    * no-limit guard like rn <= 100000000) must keep the spill-capable
    * window plan. Mirrors Spark's own InferWindowGroupLimit threshold. */
  private val MaxRewriteK = 1000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _)) if part.nonEmpty && order.nonEmpty =>
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => rankBound(c, rn))
      if (bounds.isEmpty || bounds.min <= 0 || bounds.min > MaxRewriteK) f
      else {
        val k = bounds.min
        val rest = conjuncts.filter(c => rankBound(c, rn).isEmpty)
        val rankAttr = AttributeReference("graft_rank", LongType, nullable = false)()
        val topk = TopKPerGroup(part, order, k, rankAttr, child)
        // re-expose the rank under the original attribute (row_number is
        // IntegerType; our operator emits LongType)
        val proj = Project(
          child.output :+ Alias(Cast(rankAttr, IntegerType), alias.name)(
            exprId = rn.exprId, qualifier = rn.qualifier), topk)
        if (rest.isEmpty) proj else Filter(rest.reduce(And), proj)
      }
  }
}
