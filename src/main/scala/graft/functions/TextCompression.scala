package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressibility as a text-quality signal: near-random text deflates to
  * ~its own size while templated/repetitive text (boilerplate, scraped
  * nav bars, token floods) collapses — large-scale web-corpus pipelines
  * use the compression ratio as a cheap repetition proxy alongside the
  * explicit n-gram rules (Rae et al. 2021 "Gopher" §A.1.1 quality
  * heuristics; Penedo et al. 2023 "RefinedWeb" filtering). DEFLATE at a
  * fixed level is deterministic for a given input, so the signal is
  * pinnable; it is NOT portable across zlib builds, hence rows-only (no
  * SQL oracle) with a GoldenHashSpec content pin.
  */
object CompressionOps {
  // One Deflater per executor thread, reset() between rows: construction
  // allocates native zlib state and was the dominant non-compression cost
  // when paid per document. Thread-locals live for the executor thread's
  // lifetime — bounded by thread count, reused across tasks.
  private val localDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
  }

  /** zlib-DEFLATE byte length of `bytes` at the default level — called
    * from both interpreted eval and generated code.
    */
  def deflatedLength(bytes: Array[Byte]): Int = {
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** Codegen'd scalar: DEFLATE length of a string's UTF-8 bytes. The zlib
  * call dominates cost, but staying a native Expression keeps the
  * surrounding projection inside whole-stage codegen (a Scala UDF would
  * break the span and pay conversion per row).
  */
case class DeflatedLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(s: Any): Any =
    CompressionOps.deflatedLength(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressionOps.deflatedLength($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DeflatedLength =
    copy(child = newChild)
}

object TextCompression {
  private val FnName = "graft_deflate_len"

  /** Idempotently register and call as a column (same temp-function
    * pattern as [[VectorExpressions.dot]]).
    */
  def deflatedLen(spark: SparkSession, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => DeflatedLength(exprs(0)), "scala_udf")
    call_function(FnName, c)
  }
}
