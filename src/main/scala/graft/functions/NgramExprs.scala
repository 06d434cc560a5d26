package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram generation for the text/dedup family (SURVEY §2.3).
  *
  * The built-in route — `transform(sequence(1, len - k + 1), i -> ...)` —
  * evaluates an interpreted lambda per gram: for a corpus explode that is
  * millions of boxed closure calls and dominates the shingle stage (the
  * same failure mode vec_dot fixes for the similarity family). These
  * expressions emit the identical gram arrays as whole-stage-codegen'd
  * tight loops.
  *
  * Semantics match the transform formulations bit for bit (so the DuckDB
  * oracle SQL is unchanged):
  *  - `char_ngrams(text, k)`: substr(text, i, k) for i = 1..max(len-k+1, 1)
  *    — a document shorter than k chars yields itself as the single gram.
  *  - `word_ngrams(toks, k)`: concat_ws(' ', slice(toks, i, k)) for
  *    i = 1..max(size-k+1, 1) — over an already-split token array so the
  *    tokenization (and its edge cases) stays the caller's.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "char_ngrams: n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects STRING input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    val m = math.max(t.numChars() - (n - 1), 1)
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) { arr(i) = t.substringSQL(i + 1, n); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      s"""
        int $m = java.lang.Math.max($c.numChars() - ${n - 1}, 1);
        Object[] $arr = new Object[$m];
        for (int $i = 0; $i < $m; $i++) {
          $arr[$i] = $c.substringSQL($i + 1, $n);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "word_ngrams: n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects ARRAY<STRING> input, got ${other.simpleString}")
  }

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val m = math.max(sz - (n - 1), 1)
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + n, sz)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (toks.isNullAt(j)) null else toks.getUTF8String(j)
        j += 1
      }
      arr(i) = UTF8String.concatWs(sep, parts: _*) // skips nulls, as concat_ws
      i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val sepRef = ctx.addReferenceObj("sep", sep, u)
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val sz = ctx.freshName("sz")
      val end = ctx.freshName("end")
      val arr = ctx.freshName("arr")
      val parts = ctx.freshName("parts")
      s"""
        int $sz = $c.numElements();
        int $m = java.lang.Math.max($sz - ${n - 1}, 1);
        Object[] $arr = new Object[$m];
        for (int $i = 0; $i < $m; $i++) {
          int $end = java.lang.Math.min($i + $n, $sz);
          $u[] $parts = new $u[$end - $i];
          for (int $j = $i; $j < $end; $j++) {
            $parts[$j - $i] = $c.isNullAt($j) ? null : $c.getUTF8String($j);
          }
          $arr[$i] = $u.concatWs($sepRef, $parts);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object NgramExprs {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: second argument must be an integer literal, got $other")
  }

  private def charBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, "char_ngrams takes exactly 2 arguments")
    CharNgrams(children.head, intLit(children.last, "char_ngrams"))
  }

  private def wordBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, "word_ngrams takes exactly 2 arguments")
    WordNgrams(children.head, intLit(children.last, "word_ngrams"))
  }

  /** Idempotently register both functions with the session's registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => charBuilder(children))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => wordBuilder(children))
  }

  /** Inject into a [[org.apache.spark.sql.SparkSessionExtensions]] — the
    * production wiring (see [[graft.GraftExtensions]]). */
  def inject(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => charBuilder(children)))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => wordBuilder(children)))
  }
}
