package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd native [[DotProduct]] expression. The HOF tree
  * is CodegenFallback (interpreted, allocates an intermediate array
  * per row); the native form is a fused primitive loop with identical
  * accumulation order, so results are bit-equal. Users who write the
  * idiomatic HOF formulation get native speed transparently when the
  * [[graft.GraftExtensions]] are installed.
  *
  * Edge-case parity with the HOF tree: null elements propagate to a
  * NULL result (DotProduct checks per element), and a length mismatch
  * — where zip_with pads with nulls and the sum goes NULL — is
  * preserved by wrapping the rewrite in a size guard (DotProduct
  * alone returns NaN there, which is its documented direct-call
  * contract).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** x * y (possibly through double casts) of exactly the two lambda
    * variables, in either order. */
  private def isMulOfVars(body: Expression, vs: Seq[NamedLambdaVariable]): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) => strip(c)
      case other => other
    }
    body match {
      case Multiply(a, b, _) =>
        val sa = strip(a); val sb = strip(b)
        (sa, sb) match {
          case (v1: NamedLambdaVariable, v2: NamedLambdaVariable) =>
            Seq(v1.exprId, v2.exprId).toSet == vs.map(_.exprId).toSet
          case _ => false
        }
      case _ => false
    }
  }

  private def isAddOfVars(body: Expression, vs: Seq[NamedLambdaVariable]): Boolean =
    body match {
      case Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
        Seq(a.exprId, b.exprId).toSet == vs.map(_.exprId).toSet
      case _ => false
    }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(v: NamedLambdaVariable), _) =>
      body.exprId == v.exprId
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0.0, DoubleType), _, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mulBody, mulVars, _)),
            zero,
            LambdaFunction(addBody, addVars, _),
            finish)
          if isNumericArray(a) && isNumericArray(b) && isZero(zero) &&
            isMulOfVars(mulBody,
              mulVars.collect { case v: NamedLambdaVariable => v }) &&
            isAddOfVars(addBody,
              addVars.collect { case v: NamedLambdaVariable => v }) &&
            isIdentity(finish) =>
        If(EqualTo(Size(a, legacySizeOfNull = false),
                   Size(b, legacySizeOfNull = false)),
           DotProduct(a, b),
           Literal(null, DoubleType))
    }
}
