package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]], as a codegen'd
  * Catalyst expression — the executor-side half of the bloom-prefiltered
  * incremental dedup ([[graft.operators.Dedup.incrementalNew]]).
  *
  * The filter ships SERIALIZED in the expression (a plan literal, handed to
  * codegen via `addReferenceObj`), so the probe runs inside whole-stage
  * codegen with zero per-row allocation beyond the key's byte view. Probe
  * semantics match how `DataFrame.stat.bloomFilter` inserted the strings:
  * both sides hash the UTF-8 bytes (`putString` delegates to `putBinary`),
  * so a probe can never miss an inserted key — the no-false-negatives
  * guarantee the exactness argument rests on.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom probe needs a string key, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFns {
  val FnName = "graft_bloom_might_contain"

  /** `mightContain(filter, key)` as a codegen'd column over string keys. */
  def mightContain(spark: SparkSession, key: Column,
      filter: BloomFilter): Column = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      filter.writeTo(bos)
      bos.toByteArray
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => BloomMightContain(exprs.head, bytes), "scala_udf")
    call_function(FnName, key)
  }
}
