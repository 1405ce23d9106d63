package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two ARRAY<DOUBLE> columns.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is interpreted — every element allocates lambda-variable holders and boxes
  * through `InternalRow` — and it sits in the innermost loop of every
  * similarity operator (|pairs| × dims evaluations). This expression stays
  * inside whole-stage codegen: one fused primitive loop over the two
  * `ArrayData`, no allocation, no boxing.
  *
  * Semantics: EXACTLY the HOF form's, so the optimizer rewrite
  * ([[graft.plans.RewriteHofDotProduct]]) is sound on every input —
  * sequential left-fold in element order (bit-for-bit the same result as the
  * interpreted fold and the DuckDB oracle's `list_sum(list_transform)`,
  * IEEE double addition in the same order); NULL when either array is NULL
  * (`nullIntolerant`), when the lengths differ (zip_with pads the shorter
  * side with NULL, nulling the fold), or when any element is NULL. The
  * element null checks are emitted only for inputs whose array type admits
  * null elements — dense embedding columns keep the tight two-load loop.
  *
  * BEHAVIOR CHANGE (since the pre-rewrite version of this expression):
  * ragged lengths used to truncate to the shorter array and NULL elements
  * read as 0; both now yield NULL — required for the optimizer rewrite's
  * soundness. Callers relying on the old truncating semantics must pad/
  * slice their arrays explicitly. One bit-level nit, documented rather than
  * papered over: for two empty arrays the HOF form returns -0.0 (zip_with
  * of empties folds the literal) while vec_dot returns +0.0 — equal under
  * `==` and every aggregate, distinguishable only by `java.lang.Double
  * .compare`/bit pattern, which nothing in this engine does.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // The builders in [[VectorFunctions]] insert casts; anything else reaching
  // analysis with a non-double-array type is rejected here (ExpectsInputTypes
  // is not an option — AbstractDataType is private[sql]).
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires ARRAY<DOUBLE> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // ragged lengths / null elements null the result even when both array
  // COLUMNS are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // emit element null checks only where the type admits null elements
      val nullChecks = Seq(
        if (elemsNullable(left)) Some(s"$a.isNullAt($i)") else None,
        if (elemsNullable(right)) Some(s"$b.isNullAt($i)") else None).flatten
      val elemGuard = if (nullChecks.isEmpty) ""
        else s"if (${nullChecks.mkString(" || ")}) { ${ev.isNull} = true; break; }"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemGuard
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column + SQL surfaces for the vector expressions. */
object VectorFunctions {

  private def toDoubleArray(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  /** Dataset/Column API: `vecDot(col("a"), col("b"))`. Float/int arrays are
    * cast to ARRAY<DOUBLE> (a no-op cast is optimized away).
    */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(toDoubleArray(ColumnBridge.expression(a)),
      toDoubleArray(ColumnBridge.expression(b))))

  /** SQL + optimizer registration — apply with
    * `SparkSession.builder().withExtensions(VectorFunctions.register)`:
    * `SELECT vec_dot(a, b)` works in `spark.sql`, and the
    * `aggregate(zip_with(...))` dot-product idiom is rewritten to the
    * native expression wherever it appears
    * ([[graft.plans.RewriteHofDotProduct]]).
    */
  val register: SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot(ARRAY<DOUBLE>, ARRAY<DOUBLE>) takes 2 arguments, got ${children.size}")
        VecDot(toDoubleArray(children.head), toDoubleArray(children(1)))
      }))
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
  }
}
