package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector-similarity hot path
  * (SURVEY.md §7.4): dot product over `array<float>` / `array<double>`.
  *
  * Why a custom Expression (preference order (b) from the build brief):
  * `zip_with` + `aggregate` allocate a lambda frame and an intermediate
  * array per row — measured ~5× slower on the pairwise-cosine queries. This
  * node generates a tight primitive loop inside whole-stage codegen.
  *
  * Semantics: elements are cast to double BEFORE multiplying and summed
  * left-to-right in index order — bitwise-identical to the DuckDB oracle's
  * `list_sum(list_transform(...))` formulation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<float|double> inputs, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xGet = if (elemType(left) == FloatType) s"(double) $a.getFloat(i)"
        else s"$a.getDouble(i)"
      val yGet = if (elemType(right) == FloatType) s"(double) $b.getFloat(i)"
        else s"$b.getDouble(i)"
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  sum += $xGet * $yGet;
         |}
         |${ev.value} = sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API surface for the native dot product. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
