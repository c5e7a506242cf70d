package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton (Z-order) bit interleaving of 2-4 16-bit grid codes into one
  * `long` sort key — the clustering primitive behind multi-dimensional
  * file skipping (Delta's `OPTIMIZE ZORDER BY`, Iceberg's z-order rewrite
  * strategy).
  *
  * A lexicographic sort on (a, b) gives tight per-file bounds on `a` and
  * useless ones on `b`; sorting by the interleaved key gives every named
  * dimension ~sqrt-tight bounds, so a predicate on ANY of them skips
  * files. Each child is a grid cell index in [0, 65535] (the caller
  * scales raw values — see `CdcEngine.zorderKey`); bits are interleaved
  * round-robin from the most significant down, child 0 taking the highest
  * bit of each group, so the key orders by the classic Z-curve.
  *
  * Why a custom Expression (SURVEY.md §4 ladder, option b): built-ins can
  * express this only as a 32-128 node shiftleft/bitor chain per row —
  * codegen'd but enormous — while this emits one tight 16-iteration loop
  * inside whole-stage codegen, and gives SQL a `interleave_bits(...)`
  * function for free.
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"interleave_bits expects 2-4 arguments, got ${children.size}")
    else if (!children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        "interleave_bits expects int arguments, got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  /** Null-intolerant: any null input yields null (callers building sort
    * keys coalesce nulls to a grid cell explicitly, so a silent 0 here
    * would hide a bug rather than help). */
  override def nullable: Boolean = children.exists(_.nullable)

  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val k = children.size
    val vals = new Array[Int](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Int] & 0xffff
      i += 1
    }
    var out = 0L
    var b = 15
    while (b >= 0) {
      var j = 0
      while (j < k) {
        out = (out << 1) | ((vals(j) >>> b) & 1)
        j += 1
      }
      b -= 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    // every local ctx.freshName'd — same Janino-fusion discipline as VecDot
    val vs = children.indices.map(_ => ctx.freshName("ibv"))
    val bit = ctx.freshName("ibb")
    val childEval = gens.map(_.code.toString).mkString("\n")
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val masks = gens.zip(vs)
      .map { case (g, v) => s"int $v = ((int) ${g.value}) & 0xffff;" }
      .mkString("\n  ")
    val steps = vs
      .map(v => s"${ev.value} = (${ev.value} << 1) | (($v >>> $bit) & 1);")
      .mkString("\n    ")
    ev.copy(code = code"""
      |$childEval
      |boolean ${ev.isNull} = $anyNull;
      |long ${ev.value} = 0L;
      |if (!${ev.isNull}) {
      |  $masks
      |  for (int $bit = 15; $bit >= 0; $bit--) {
      |    $steps
      |  }
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits = copy(newChildren)

  override def prettyName: String = "interleave_bits"
}
