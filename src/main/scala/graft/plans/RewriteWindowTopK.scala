package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Domain optimizer rule (extension tier (c)): rewrites the universal
  * top-k-per-group SQL idiom
  *
  *   SELECT <cols> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY g ORDER BY o) AS rn
  *     FROM t) WHERE rn <= k          -- and rn is then dropped
  *
  * into the bounded-heap `TopKPerGroup` operator. The window form
  * sorts and shuffles EVERY row of every group before the filter
  * throws all but k away; the rewritten plan prunes map-side to
  * ≤ k·groups·partitions rows (the q87 exec) — same rows out, a
  * corpus-sized exchange replaced by a metadata-sized one. Users keep
  * writing the idiom; the planner pays for it properly.
  *
  * Fires only when the rewrite is provably row-identical:
  *  - the Window computes exactly ONE function, a row_number();
  *  - the filter is a bare `rn <= IntegerLiteral` (or `<`), and the
  *    enclosing Project neither keeps nor uses `rn` — so nothing
  *    downstream can observe the rank values themselves (row_number
  *    on a non-total ORDER BY is tie-arbitrary in BOTH forms, so the
  *    nondeterminism class is unchanged);
  *  - every PARTITION BY key is a plain attribute whose type contains
  *    no float/double ANYWHERE — top-level or nested in a struct /
  *    array / map (the exec groups by raw row bytes and opts out of
  *    -0.0/NaN normalization, so a nested double would split one
  *    logical group on byte patterns; same coverage as Catalyst's
  *    NormalizeFloatingNumbers.needNormalize);
  *  - k ≥ 1 and the partition list is non-empty (a global top-k is
  *    TakeOrderedAndProject's job, which Spark already plans).
  *
  * Opt-out: `spark.graft.rewriteWindowTopK` = false.
  */
case class RewriteWindowTopK() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled =
      conf.getConfString("spark.graft.rewriteWindowTopK", "true") == "true"
    if (!enabled) plan
    else plan.transformUp {
      case Project(projList,
          Filter(cond,
            Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
              part, order, child, _)))
          if part.nonEmpty &&
            part.forall(p => p.isInstanceOf[Attribute] &&
              !TopKPerGroupExec.containsFloat(p.dataType)) &&
            projList.forall(!_.references.contains(alias.toAttribute)) &&
            kFromCond(cond, alias.toAttribute).exists(_ >= 1) =>
        val k = kFromCond(cond, alias.toAttribute).get
        Project(projList,
          TopKPerGroup(part.map(_.asInstanceOf[Attribute]), order, k, child))
    }
  }

  /** `rn <= k` / `rn < k` with a literal bound → Some(effective k). */
  private def kFromCond(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) =>
      Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) =>
      Some(k - 1)
    case _ => None
  }
}
