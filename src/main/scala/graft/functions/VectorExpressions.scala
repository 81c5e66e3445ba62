package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the hot
  * inner loop of every similarity operator. The `zip_with`+`aggregate`
  * formulation is semantically identical but runs interpreted (higher-order
  * functions are excluded from whole-stage codegen and re-allocate a lambda
  * frame per element); this expression generates a tight primitive loop, ~2
  * orders of magnitude faster on 64-dim vectors.
  *
  * Numeric contract (shared with the DuckDB oracle): each float is widened
  * to double, multiplied in double, and accumulated strictly left-to-right —
  * bit-identical to `list_sum(list_transform(...))` in the oracle SQL and to
  * the previous HOF formulation. Null ELEMENTS (parquet array slots are
  * containsNull at the schema level even when the data has none) contribute
  * exactly 0 to the sum — defined behavior, not a raw read of the null slot.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Scalar (max-abs) int8 quantization of a float vector — the 4× memory /
  * bandwidth lever for embedding search at 100 TB: q_i = ⌊x_i·127/amax +
  * 0.5⌋ with amax = max|x_i|, emitted as integer-VALUED floats so the
  * codegen'd [[FloatDotProduct]] consumes them unchanged (|q_i| ≤ 127 ⇒
  * 64-dim int dots ≤ ~10⁶, exact in float and in the double widening).
  *
  * One pass computes amax, a second emits the array — a single codegen'd
  * loop pair per row. The naive `transform(v, x -> ... aggregate(v...))`
  * formulation would re-evaluate the amax aggregate per ELEMENT (projection
  * collapse inlines referenced columns into every lambda body, and
  * higher-order functions run interpreted with no CSE — the measured trap
  * behind FloatDotProduct's existence).
  *
  * Numeric contract (shared with the DuckDB oracle): amax and the scale
  * division in double, `floor(x·127/amax + 0.5)` — floor is exact, so the
  * quantized values are bit-identical across engines; downstream integer
  * dots are exact in any order. A zero vector (amax = 0) quantizes to all
  * zeros rather than NaN. Null ELEMENTS read as exactly 0f in both passes
  * (previously they were raw-read as arbitrary slot bytes), so the declared
  * containsNull = false output is honest for any input.
  */
case class Int8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize_i8 expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = math.abs(v.getFloat(i).toDouble)
        if (x > amax) amax = x
      }
      i += 1
    }
    val out = new Array[Float](n)
    if (amax > 0.0) {
      i = 0
      while (i < n) {
        val x = if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble
        out(i) = math.floor(x * 127.0 / amax + 0.5).toFloat
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val amax = ctx.freshName("amax")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $x = java.lang.Math.abs((double) $a.getFloat($i));
         |    if ($x > $amax) $amax = $x;
         |  }
         |}
         |float[] $out = new float[$n];
         |if ($amax > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (float) java.lang.Math.floor(
         |      ($a.isNullAt($i) ? 0.0 : (double) $a.getFloat($i)) * 127.0 / $amax + 0.5);
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object VectorExpressions {
  private val FnName = "graft_dot"
  private val QuantName = "graft_quantize_i8"

  /** Idempotently register the expression in the session's function
    * registry (temp function → callable from both the Column API and SQL).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => FloatDotProduct(exprs(0), exprs(1)), "scala_udf")

  /** Σ aᵢ·bᵢ over two float arrays as a codegen'd column. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(FnName, a, b)
  }

  /** Max-abs int8 quantization as a codegen'd column (integer-valued
    * floats, [[FloatDotProduct]]-compatible).
    */
  def quantizeInt8(spark: SparkSession, a: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      QuantName, exprs => Int8Quantize(exprs(0)), "scala_udf")
    call_function(QuantName, a)
  }
}
