package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane (sign-projection) LSH sketch over a float vector:
  * `bands` band keys, each packing `rows` sign bits of deterministic
  * pseudo-random hyperplane projections (Charikar's SimHash for cosine —
  * P[bit agrees] = 1 − θ/π). Two vectors are LSH candidates when any band
  * key matches, which an equi-join on (band, key) finds without the O(n²)
  * cross product.
  *
  * Determinism: the hyperplane matrix derives from (seed, bit, dim) through
  * a splitmix64 mix — identical on driver and every executor, no RNG state,
  * stable across runs (the recall measured at a scale factor is the recall
  * shipped). Codegen'd: one fused primitive loop per row in the scan stage,
  * no interpreted higher-order functions.
  *
  * Threshold economics (measured on the synthetic embeddings corpus — see
  * SCALING.md): sign-LSH separates candidates well when the threshold angle
  * is far from the background (cos ≥ 0.7 on a near-orthogonal corpus); at
  * cos 0.45 the bit-agreement gap (0.648 vs 0.5) is too narrow to prune,
  * so the exact blocked join ([[graft.operators.Similarity.cosinePairs]])
  * is the better plan there. Both are shuffle-partitioned equi-joins.
  */
case class HyperplaneBandKeys(child: Expression, bands: Int, rows: Int, seed: Long)
    extends UnaryExpression {
  import HyperplaneBandKeys.MaxDim

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bands expects array<float>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Recomputed per deserialized instance — a pure function of the fields,
  // so every executor derives the identical matrix.
  @transient private lazy val weights: Array[Double] =
    HyperplaneBandKeys.weights(bands * rows, seed)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), MaxDim)
    val w = weights
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands * rows) {
      val off = j * MaxDim
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * w(off + i); i += 1 }
      if (acc > 0.0) out(j / rows) |= 1L << (j % rows)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("hyperplanes", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $MaxDim);
         |long[] $arr = new long[$bands];
         |for (int $j = 0; $j < ${bands * rows}; $j++) {
         |  int $off = $j * $MaxDim;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.getFloat($i)) * $w[$off + $i];
         |  }
         |  if ($acc > 0.0) $arr[$j / $rows] |= 1L << ($j % $rows);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandKeys =
    copy(child = newChild)
}

object HyperplaneBandKeys {
  /** Hyperplane components exist for the first MaxDim dimensions; longer
    * vectors are sketched on their MaxDim-prefix projection (still a valid
    * LSH family — a fixed linear projection of the input).
    */
  val MaxDim = 128

  private val FnName = "graft_hyperplane_bands"

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D4ECE87BD95CFDL
    z ^ (z >>> 31)
  }

  /** Flat [bit][dim] matrix of uniform [-1, 1) components — symmetric about
    * zero, which is all sign-projection needs (the sign bit of w·v is
    * invariant to the radial component of w's distribution).
    */
  private[functions] def weights(nBits: Int, seed: Long): Array[Double] = {
    val w = new Array[Double](nBits * MaxDim)
    var j = 0
    while (j < nBits) {
      var i = 0
      while (i < MaxDim) {
        val h = splitmix64(seed * 0x100000001B3L + j * 131L + i)
        w(j * MaxDim + i) = (h >>> 11) * math.pow(2, -53) * 2.0 - 1.0
        i += 1
      }
      j += 1
    }
    w
  }

  /** Idempotently register; callable as
    * `graft_hyperplane_bands(vec, bands, rows, seed)` (literal params).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => HyperplaneBandKeys(exprs(0),
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval() match { case i: Int => i.toLong; case l: Long => l }),
      "scala_udf")

  /** Band-key array column for the LSH candidate join. */
  def keys(spark: SparkSession, vec: Column, bands: Int, rows: Int, seed: Long): Column = {
    register(spark)
    call_function(FnName, vec, lit(bands), lit(rows), lit(seed))
  }
}
