package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst functions available to ANY session via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`), the standard way a
  * Spark-native library ships planner/function extensions — no session
  * bootstrap code needed on the user side.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarityDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.FoldSelfCosine())
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK())
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {
  private[graft] val cosineSimilarityDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => CosineSimilarity(children.head, children(1)))
}
