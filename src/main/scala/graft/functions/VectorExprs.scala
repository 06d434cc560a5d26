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

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
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
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
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
