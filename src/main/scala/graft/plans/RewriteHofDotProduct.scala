package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.VecDot

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[VecDot]]. Higher-order functions are
  * interpreted (lambda-variable holders + boxing per element), and this
  * exact shape is the innermost loop of every vector-similarity query a
  * user writes declaratively — in SQL via `spark.sql`, or with
  * `functions.aggregate`/`zip_with`. The rewrite is SOUND on every input
  * because [[VecDot]] reproduces the HOF semantics exactly: NULL for a NULL
  * array, ragged lengths (zip_with pads with NULL, nulling the fold), or a
  * NULL element; bit-for-bit the same IEEE fold order otherwise
  * (VectorFunctionsSpec pins the equivalence).
  *
  * Matching is conservative: the multiply must be over exactly the two zip
  * lambda variables (either order — double multiplication commutes
  * bit-for-bit), the fold must be `acc + element` (either order, same
  * argument), the zero literal 0.0D, the finish lambda the identity, and
  * both inputs ARRAY<DOUBLE>. Anything else is left untouched.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` (see
  * `VectorFunctions.register`) — the brief's extension point (c): a
  * `Rule[LogicalPlan]` where composition can't recover performance.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nlv: NamedLambdaVariable => nlv.exprId == v.exprId
    case _ => false
  }

  /** f(l, r) is exactly {x op y} over the two lambda vars, either order. */
  private def isBinOpOfVars(l: Expression, r: Expression,
                            x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(arg: NamedLambdaVariable), _) => isVar(body, arg)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          finish)
        if isZeroDouble(zero) && isBinOpOfVars(ml, mr, x, y) &&
          isBinOpOfVars(al, ar, acc, el) && isIdentity(finish) &&
          isDoubleArray(a) && isDoubleArray(b) =>
      VecDot(a, b)
  }
}
