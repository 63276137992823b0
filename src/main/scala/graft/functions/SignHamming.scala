package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: sign-bit Hamming distance of two float
  * vectors — the binary-quantization (q239) scoring kernel. Counts
  * dimensions where sign(x) ≠ sign(y) with the fixed x ≥ 0 sign rule,
  * in one branch-light whole-stage-codegen loop.
  *
  * Why a custom Expression (the CosineSimilarity rationale, tier (b)):
  * the composable form `aggregate(zip_with(a, b, ...), ...)` runs
  * interpreted HOF lambdas and boxes every element; at index-serving
  * rates the Hamming kernel IS the scan cost, so it must live inside
  * codegen. Semantics are integer-exact, so the DuckDB
  * list-comprehension oracle (q239) matches bit-for-bit.
  *
  * Constraint: array elements must be non-null (embedding vectors);
  * mismatched lengths use the common prefix.
  */
case class SignHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sign_hamming requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var h = 0L
    var i = 0
    while (i < n) {
      if ((x.getFloat(i) >= 0f) != (y.getFloat(i) >= 0f)) h += 1L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $h = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (($a.getFloat($i) >= 0f) != ($b.getFloat($i) >= 0f)) $h++;
        |}
        |${ev.value} = $h;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignHamming =
    copy(left = newLeft, right = newRight)
}

object SignHamming {
  /** Column-API entry point. */
  def signHamming(a: Column, b: Column): Column =
    ColumnBridge.column(SignHamming(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: makes `sign_hamming(a, b)` usable in spark.sql
    * text (SparkSessionExtensions-style function injection).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_hamming",
      exprs => SignHamming(exprs.head, exprs(1)),
      "built-in")
}
