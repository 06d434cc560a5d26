package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic for the similarity-search family (SURVEY §2.3).
  *
  * The built-in route — `aggregate(zip_with(a, b, (x, y) -> x * y), 0d,
  * (acc, v) -> acc + v)` — evaluates an interpreted lambda per element:
  * for a 64-dim embedding self-join that is ~100M boxed closure calls and
  * dominates the query. `vec_dot` is the same left-to-right fold (bit-for-
  * bit identical doubles) as a whole-stage-codegen'd tight loop over the
  * unsafe array data, which is the preference order the engine follows:
  * compose built-ins where they're fast, drop to a custom codegen
  * `Expression` where they're not.
  *
  * Registered as a SQL function (`vec_dot`) so operators use it via
  * `expr(...)`; cosine = vec_dot(a, b) / (sqrt(vec_dot(a, a)) *
  * sqrt(vec_dot(b, b))).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  // Result can be NULL even for non-null array inputs (length mismatch or
  // a null element — the same cases where the aggregate(zip_with) form
  // yields NULL; silently truncating or reading a null slot as 0.0 would
  // be a wrong number, not an error).
  override def nullable: Boolean = true

  /** Static skip: only emit per-element null checks when either child's
    * element type admits nulls. */
  private lazy val mayHaveNullElements: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, n1), ArrayType(_, n2)) => n1 || n2
    case _ => true
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (mayHaveNullElements && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val elemNullCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $elemNullCheck
            $s += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) ${ev.value} = $s;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  private def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2, "vec_dot takes exactly 2 arguments")
    VecDot(children.head, children.last)
  }

  /** Idempotently register `vec_dot` with the session's function registry.
    * Safe to call from every query constructor. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => builder(children))

  /** Inject into a [[org.apache.spark.sql.SparkSessionExtensions]] — the
    * production wiring (`spark.sql.extensions=graft.GraftExtensions`): every
    * session in the cluster gets the function at build time, no runtime
    * registration call needed. */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => builder(children)))
}
