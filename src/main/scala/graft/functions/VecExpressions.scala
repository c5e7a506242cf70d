package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the ANN hot loop: dot product of two
  * fixed-width numeric arrays (`array<float>` embeddings or `array<double>`).
  *
  * Why a custom Expression (SURVEY.md §4 preference ladder, option b):
  * built-ins can only express this as `aggregate(zip_with(...))` — evaluated
  * interpreted, one closure call per element — or as a D-term unrolled
  * `a[0]*b[0] + ...` chain, which codegens but emits D GetArrayItem nodes
  * per pair. This expression emits ONE tight Java loop inside whole-stage
  * codegen: no allocation, no boxing, ~D fused multiply-adds per pair.
  * Summation is sequential (index order), bit-identical to the oracle's
  * ordered fold and to the unrolled chain it replaces.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  /** Null beyond input-null: mismatched lengths and null elements yield NULL
    * (matching built-in array-function semantics) rather than a silently
    * truncated / garbage dot product, so `nullable` must be unconditional. */
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def elemNullable(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // EVERY local is ctx.freshName'd: two vec_dots fused into one codegen
      // context (q26-q28's norm + pair-dot projections) would otherwise emit
      // duplicate locals, fail Janino, and silently fall back to the
      // interpreter — defeating the whole point of the expression.
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      // skip per-element null checks when the array type guarantees no nulls
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ($getA) * ($getB);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot = copy(newLeft, newRight)

  override def prettyName: String = "vec_dot"
}

/** Column-level API + SQL registration for the vector expressions. */
object VecOps {

  /** `vec_dot(a, b)` as a Column. The session must have the function
    * registered (`VecOps.register(spark)` or GraftExtensions) — Spark 4's
    * Column-from-Expression constructors are private[sql], so the public
    * registry + call_function route is the supported wiring. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  /** `interleave_bits(c0, c1[, c2[, c3]])` as a Column — the Morton
    * (Z-order) sort key over 16-bit grid codes (see [[InterleaveBits]]). */
  def interleaveBits(codes: Seq[Column]): Column =
    org.apache.spark.sql.functions.call_function("interleave_bits", codes: _*)

  /** Register graft's native functions in the session's function registry
    * so `expr()` / `spark.sql` can call them. Idempotent. (The
    * SparkSessionExtensions route — spark.sql.extensions=
    * graft.functions.GraftExtensions — injects the same builders at
    * session build time.) */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (children: Seq[Expression]) => InterleaveBits(children))
  }
}

/** Session extension installing graft's native functions:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (children: Seq[Expression]) => InterleaveBits(children)))
  }
}
