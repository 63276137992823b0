package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: squared L2 distance of two numeric
  * vectors in ONE codegen'd pass — the [[CosineSimilarity]] discipline
  * applied to the distance kernel the clustering / PQ family runs
  * hottest (kmeans assignment scans k·|corpus| candidate rows per
  * round; the PQ encode scans m·nCent candidates per vector).
  *
  * Why (guide §4 / optimization-round rule 4): the composable form —
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0d, (acc,x) => acc+x)`
  * — walks the arrays through INTERPRETED higher-order lambdas (HOFs
  * have no codegen), boxing every element. This kernel is the same
  * per-element fold as a tight branch-free loop.
  *
  * Accumulation is per-element in array order with double math —
  * bit-identical to the HOF form it replaces and to the DuckDB
  * oracle's list-comprehension form (the hash-gated queries prove it).
  *
  * Constraint: elements must be non-null; mismatched lengths use the
  * common prefix (the HOF form's zip_with pads the shorter side with
  * nulls and returns NULL — callers only ever compare equal-length
  * vectors, where both forms agree).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    // LongType: quantized int8 codes (|x| <= 127) — the double conversion
    // is exact below 2^53, so the fold is bit-identical to the integer
    // HOF form it replaces
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_distance requires array<float|double|long> on both sides, " +
        s"got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_distance"

  // 0 = float, 1 = double, 2 = long
  private def kind(dt: DataType): Int =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => 0
      case DoubleType => 1
      case LongType => 2
    }
  private def getD(a: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int, k: Int): Double = k match {
    case 0 => a.getFloat(i).toDouble
    case 1 => a.getDouble(i)
    case _ => a.getLong(i).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lk = kind(left.dataType)
    val rk = kind(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = getD(x, i, lk)
      val yv = getD(y, i, rk)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
      def get(arr: String, idx: String, k: Int): String = k match {
        case 0 => s"(double) $arr.getFloat($idx)"
        case 1 => s"$arr.getDouble($idx)"
        case _ => s"(double) $arr.getLong($idx)"
      }
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $dd = ${get(a, i, kind(left.dataType))}
        |    - ${get(b, i, kind(right.dataType))};
        |  $acc += $dd * $dd;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  /** Column-API entry point. */
  def squaredDistance(a: Column, b: Column): Column =
    ColumnBridge.column(SquaredDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
