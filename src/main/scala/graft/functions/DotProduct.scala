package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product of two numeric arrays, double accumulation,
  * sequential left fold — bit-identical to the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` higher-order-function
  * tree it replaces (see [[graft.plans.RewriteDotProduct]]), but
  * codegen'd instead of interpreted. NULL if either array holds a
  * null element (matching the HOF tree's null propagation); NaN on
  * length mismatch (the HOF tree yields NULL there — the rewrite
  * rule wraps this expression in a length guard to preserve that).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // null elements in a containsNull array make the result null even
  // when both array arguments are non-null
  override def nullable: Boolean = true

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float>/array<double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return Double.NaN
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.value} = Double.NaN;
         |} else {
         |  double $dot = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      $anyNull = true;
         |    } else {
         |      $dot += ($getX) * ($getY);
         |    }
         |  }
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(DotProduct(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))
}
