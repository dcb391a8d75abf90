package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, CurrentRow, DenseRank, Expression, ExprId, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, EqualTo, Rank, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.Bridge

/** Optimizer rule (`Rule[LogicalPlan]`, SURVEY.md §2.8 extension ladder):
  * rewrites the standard top-k-per-group SQL idiom
  *
  *   SELECT ... FROM (SELECT ..., row_number() OVER
  *     (PARTITION BY p ORDER BY o) rn FROM t) WHERE rn <= k   -- rn unused
  *
  * into the [[TopKPerKeyNode]] operator, eliminating the full per-group
  * sort + whole-table shuffle the Window formulation needs. Spark's own
  * `InferWindowGroupLimit` (4.x) bounds that plan to k rows per group per
  * partition too, but still sorts and windows the survivors; the rewrite
  * removes the sort entirely (bounded heaps, see TopKPerKeyExec).
  *
  * The `rank()`/`dense_rank() <= k` idioms — which users write as often as
  * row_number when boundary ties should survive — rewrite the same way,
  * into the operator's keep-ties modes ([[RankMode]]/[[DenseRankMode]]).
  * Rank semantics depend only on rows INSIDE each group under the same
  * order, so per-group early pruning remains sound; only the per-key
  * keep-set rule changes.
  *
  * Deliberately narrow: single rank-family window expression with the
  * default ROWS UNBOUNDED PRECEDING..CURRENT ROW frame, non-empty
  * PARTITION BY and ORDER BY, a bare `rn <= k`-shaped filter, and a
  * projection that drops rn. Anything else is left to stock Catalyst.
  *
  * Opt-in via [[RowNumberTopKRewrite.enable]] rather than
  * always-on in GraftExtensions, so the library never silently changes
  * plans for sessions that didn't ask.
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  /** The keep-set mode a rank-family window function maps to; None for
    * anything the operator doesn't model.
    */
  private def modeOf(fn: Expression): Option[TopKMode] = fn match {
    case RowNumber()   => Some(RowNumberMode)
    case _: DenseRank  => Some(DenseRankMode)
    case _: Rank       => Some(RankMode)
    case _             => None
  }

  /** cond ≡ "row_number ≤ k" → Some(k). */
  private def limitOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn => Some(k)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList, Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(fn, spec), _)),
               part, order, wchild, _)))
        if part.nonEmpty && order.nonEmpty && modeOf(fn).isDefined &&
          spec.frameSpecification ==
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) &&
          limitOf(cond, alias.exprId).exists(_ > 0) &&
          projList.forall(!_.references.exists(_.exprId == alias.exprId)) =>
      // If InferWindowGroupLimit already ran (this rule registered late via
      // extraOptimizations), its node is the window's child — drop it, the
      // TopK operator subsumes the partial limit.
      val inner = wchild match {
        case WindowGroupLimit(_, _, _, _, c) => c
        case c => c
      }
      Project(projList,
        TopKPerKeyNode(part, order, limitOf(cond, alias.exprId).get, inner,
          modeOf(fn).get))
  }
}

object RowNumberTopKRewrite {
  /** Enable the rewrite (and the strategy that plans its output) on this
    * session. Idempotent.
    */
  def enable(spark: SparkSession): Unit = {
    Bridge.addStrategy(spark, TopKPerKeyStrategy)
    Bridge.addOptimization(spark, RewriteRowNumberTopK)
  }
}
