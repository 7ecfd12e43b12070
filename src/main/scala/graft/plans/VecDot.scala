package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/**
 * Native dot product over two `array<double>` columns with whole-stage
 * codegen: a tight primitive loop over `ArrayData`, no per-element boxing
 * and no lambda dispatch. The SQL-function form every embedding operator's
 * hot path can use in place of `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
 * — higher-order functions run interpreted (per-element
 * `InterpretedExpression.eval` with boxed Doubles), which is the dominant
 * per-row cost of cosine scoring at 100 TB vector counts.
 *
 * Exactness contract: the sum accumulates LEFT TO RIGHT from +0.0 —
 * bit-identical to the HOF fold it replaces and to the DuckDB oracle's
 * `list_reduce(list_prepend(0.0, ...), +)`, so swapping it into
 * oracle-checked queries cannot change a hash.
 *
 * Null semantics match `aggregate(zip_with(...))`: null array, length
 * mismatch (zip_with would pad with null), or any null element → null.
 */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs two array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      s += aa.getDouble(i) * bb.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull} &&
            ${leftGen.value}.numElements() == ${rightGen.value}.numElements()) {
          ${ev.isNull} = false;
          int $n = ${leftGen.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
              ${ev.isNull} = true;
              ${ev.value} = 0.0;
              break;
            }
            ${ev.value} +=
              ${leftGen.value}.getDouble($i) * ${rightGen.value}.getDouble($i);
          }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/**
 * Native squared-L2 distance over two `array<double>` columns — the IVF
 * assignment hot loop (per row × per centroid). Same contract as
 * [[VecDot]]: left-to-right fold from +0.0 of (a-b)·(a-b), bit-identical
 * to the `aggregate(zip_with(...))` form and the oracle; null array,
 * length mismatch, or null element → null.
 */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_l2sq"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq needs two array<double> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val d = aa.getDouble(i) - bb.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull} &&
            ${leftGen.value}.numElements() == ${rightGen.value}.numElements()) {
          ${ev.isNull} = false;
          int $n = ${leftGen.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
              ${ev.isNull} = true;
              ${ev.value} = 0.0;
              break;
            }
            double $d =
              ${leftGen.value}.getDouble($i) - ${rightGen.value}.getDouble($i);
            ${ev.value} += $d * $d;
          }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/**
 * Native INTEGER dot product over two `array<bigint>` columns — the
 * quantized model-scoring hot loop ([[graft.ml.DeepLearn]] forward
 * passes: per row × per unit × per layer). Exact integer arithmetic, so
 * unlike the double forms there is not even a rounding-order question:
 * any evaluation order gives the same bits, and swapping it into an
 * oracle-checked query cannot change a hash. Null semantics match the
 * `aggregate(zip_with(a, b, _*_), 0L, _+_)` fold it replaces: null
 * array, length mismatch (zip_with would null-pad), or any null element
 * → null. Overflow wraps like Java long multiplication — the same
 * contract as the HOF form.
 */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_idot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_idot needs two array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      s += aa.getLong(i) * bb.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${leftGen.isNull} && !${rightGen.isNull} &&
            ${leftGen.value}.numElements() == ${rightGen.value}.numElements()) {
          ${ev.isNull} = false;
          int $n = ${leftGen.value}.numElements();
          for (int $i = 0; $i < $n; $i++) {
            if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
              ${ev.isNull} = true;
              ${ev.value} = 0L;
              break;
            }
            ${ev.value} +=
              ${leftGen.value}.getLong($i) * ${rightGen.value}.getLong($i);
          }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}
