package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused dot product over two `array<float>` columns as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The composable form — `aggregate(zip_with(cast, cast, *), 0.0, +)` —
  * allocates a casted copy of each vector plus a zipped array per row pair;
  * in an ANN cross/bucket join that's three array allocations per candidate
  * pair. This expression reads both `ArrayData` buffers in one loop with no
  * allocation, while computing the IDENTICAL float→double widening and
  * left-to-right summation (so results stay bit-equal to the HOF form and
  * the DuckDB oracle).
  *
  * Null array elements are treated as 0 contribution (embeddings never
  * contain them); a null array yields null via BinaryExpression semantics.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** [[FloatDotProduct]]'s twin over two `array<bigint>` columns (r17) — the
  * KMeans-quantized vector family's dot product. The composable form
  * (`aggregate(zip_with(cast, cast, *), 0.0, +)`) is a HigherOrderFunction
  * chain that falls back to interpreted evaluation (CodegenFallback) and
  * allocates per row pair; in the k-means assign / ADC / pair-verify paths
  * that is the per-candidate hot loop. Identical long→double widening and
  * left-to-right summation, so every double is bit-equal to the HOF form
  * and the DuckDB oracle's list-comprehension fold.
  *
  * NULL/ragged-input caveat (bit-equality's precondition, not its scope):
  * the HOF form returns NULL when the arrays' lengths differ (`zip_with`
  * pads with nulls and `+` propagates) or when any element is NULL; this
  * loop instead truncates to min(n₁,n₂) and skips NULL elements — a silent
  * partial sum. On this repo's data the cases are unreachable (vectors are
  * fixed-dimension with non-null elements; the oracle hash compare
  * certifies it), but a caller feeding ragged or null-holed arrays would
  * mask an upstream bug that the HOF form surfaced as NULL. */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getLong(i).toDouble * y.getLong(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += (double) $x.getLong($i) * (double) $y.getLong($i);
         |  }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}

/** [[FloatDotProduct]] over two `array<double>` columns (r17) — the codegen
  * body behind [[Vectors.dot]]'s general form. Same left-to-right
  * summation; a no-op cast upstream normalizes float inputs, preserving
  * the old `cast → zip_with → aggregate` widening exactly.
  * Same NULL/ragged-input caveat as [[LongDotProduct]]: length mismatch
  * truncates and NULL elements are skipped (partial sum) where the HOF
  * form returned NULL — unreachable on fixed-dim, non-null vectors. */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

object VecExpr {
  /** Column face of [[FloatDotProduct]]. */
  def fdot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(FloatDotProduct(
      org.apache.spark.sql.GraftExprBridge.expression(a), org.apache.spark.sql.GraftExprBridge.expression(b)))

  /** Column face of [[LongDotProduct]]. */
  def ldot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(LongDotProduct(
      org.apache.spark.sql.GraftExprBridge.expression(a), org.apache.spark.sql.GraftExprBridge.expression(b)))

  /** Column face of [[DoubleDotProduct]]. */
  def ddot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExprBridge.column(DoubleDotProduct(
      org.apache.spark.sql.GraftExprBridge.expression(a), org.apache.spark.sql.GraftExprBridge.expression(b)))
}
