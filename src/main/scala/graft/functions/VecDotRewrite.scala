package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule rewriting the composable dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * into the native [[VecDot]] expression. Users (and the engine's own SQL
  * oracles) naturally write the higher-order-function form; its lambdas
  * run interpreted per element, which measured ~4× slower end-to-end on
  * similarity queries. The rewrite is exact — VecDot reproduces the HOF
  * form's semantics bit-for-bit (element-order double accumulation, NULL
  * on NULL input/element/length mismatch, empty arrays fold to the 0.0
  * zero) — so it fires whenever the pattern matches:
  *
  * - `zero` must be literal double 0.0 (any other start value folds
  *   differently),
  * - the zip lambda must be `x * y` up to double-widening casts of the
  *   lambda variables (matched by exprId, either order — multiplication
  *   commutes bit-exactly for doubles),
  * - the merge lambda must be `acc + v` with `acc` on the LEFT (double
  *   addition does not commute in NaN-sign corner cases; conservative),
  * - the finish lambda must be the identity,
  * - both element types must be ones VecDot widens like `cast("double")`.
  *
  * Registered via `GraftExtensions.injectOptimizerRule`; runs on resolved
  * plans, so lambda variables carry exprIds.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def okArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ShortType | ByteType, _) => true
    case _ => false
  }

  /** The lambda variable itself (only when it is ALREADY double — a bare
    * `x * y` over int/float arrays multiplies in the native type, where
    * int products wrap and float products round before widening; VecDot
    * widens FIRST, so rewriting those would change results), or any
    * variable under an explicit cast to double (then the multiply happens
    * in double either way).
    */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _)     => Some(v)
    case _                                                  => None
  }

  private def isVar(e: Expression, v: NamedExpression): Boolean =
    asVar(e).exists(x => v match {
      case nv: NamedLambdaVariable => x.exprId == nv.exprId
      case _                       => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mult: Multiply, Seq(x, y), _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add, Seq(acc, v), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if zero == 0.0 &&
            okArray(a) && okArray(b) &&
            ((isVar(mult.left, x) && isVar(mult.right, y)) ||
              (isVar(mult.left, y) && isVar(mult.right, x))) &&
            isVar(add.left, acc) && isVar(add.right, v) &&
            fin.exprId == fv.exprId =>
        VecDot(a, b)
    }
}
