package graft.plans

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSimilarity

/** Domain optimizer rule (extension tier (c), SURVEY.md §2.2): Catalyst
  * cannot constant-fold a custom Expression it knows nothing about, so
  * `cosine_similarity(v, v)` — which appears naturally when a
  * similarity self-join's pruning predicate is rewritten or a query is
  * generated — would execute the full O(dim) kernel per row only to
  * return 1.0. This rule folds the structurally-self-referential call
  * to `lit(1.0)` during optimization.
  *
  * Semantics notes:
  *  - NULL: CosineSimilarity is null-intolerant (NULL vector → NULL
  *    result), so a bare `lit(1.0)` fold would turn NULLs into 1.0.
  *    The fold keeps NULL semantics exactly: a non-nullable child
  *    folds to `lit(1.0)`; a nullable child folds to
  *    `If(IsNull(v), NULL, 1.0)` — still O(1) per row, no O(dim) kernel.
  *  - NaN: for any non-degenerate vector cos(v, v) = 1.0 exactly in
  *    IEEE doubles is NOT guaranteed (dot/(sqrt(n)*sqrt(n)) can differ
  *    in the last ulp), and the all-zero vector's 0/0 = NaN becomes
  *    1.0 under the fold. The rule therefore only fires when both
  *    children are the SAME deterministic expression AND the caller
  *    opted in via the extensions config `spark.graft.foldSelfCosine`
  *    (default true — embedding columns are non-degenerate by
  *    construction; disable for NaN-faithful audits).
  */
case class FoldSelfCosine() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = conf.getConfString("spark.graft.foldSelfCosine", "true") == "true"
    if (!enabled) plan
    else plan.transformAllExpressions {
      case CosineSimilarity(a, b)
          if a.deterministic && b.deterministic && a.semanticEquals(b) =>
        if (a.nullable) If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
        else Literal(1.0, DoubleType)
    }
  }
}
