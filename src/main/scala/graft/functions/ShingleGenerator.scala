package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator (UDTF) emitting word n-gram shingles from a token array — the
  * custom table-function extension point of SURVEY.md §2b, and the
  * single-pass replacement for the posexplode + lead()-window formulation:
  * one row in, (|tokens|-n+1) rows out, no shuffle, no per-row array
  * materialization beyond the input. The reference's only generator-shaped
  * op is the inverse of its `'//'.join` (P3); this generalizes it for the
  * near-dup pipeline.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_shingles expects array<string>, got ${t.sql}")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Nil
    else {
      val m = arr.numElements()
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val sep = UTF8String.fromString(" ")
      (0 to m - n).iterator.map { j =>
        val parts = new Array[UTF8String](n)
        var k = 0
        while (k < n) { parts(k) = toks(j + k); k += 1 }
        InternalRow(UTF8String.concatWs(sep, parts: _*))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  private val FnName = "graft_shingles"

  /** Idempotently register; callable as `graft_shingles(tokens, n)` from
    * SQL and `call_function` (n must be a literal).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => ShingleGenerator(exprs(0),
        exprs(1).eval().asInstanceOf[Int]),
      "scala_udf")

  def name: String = FnName
}
