package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate from a serialized count-min sketch (Cormode &
  * Muthukrishnan 2005): `cms_estimate(sketchBytes, item)` = the sketch's
  * estimated count of `item` — never under the true count, over by at most
  * ε·N with the sketch's confidence. Complements Spark's codegen'd
  * `count_min_sketch` AGGREGATE, which builds the sketch but offers no
  * plan-side way to query it — without this expression every probe is a
  * driver-side `collect` + `CountMinSketch.readFrom`, which is exactly the
  * pattern the engine bans in query paths.
  *
  * CodegenFallback deliberately: the expression runs post-aggregate over a
  * handful of probe rows (never in a scan stage), so interpreted eval
  * costs nothing measurable. Deserialization is memoized per (identical
  * byte-array reference) — the broadcast of the 1-row sketch frame hands
  * every probe row the same array instance.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary sketch, string item), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  // last-deserialized memo: probe rows in one task share the byte array
  @transient private var memoBytes: Array[Byte] = _
  @transient private var memoSketch: CountMinSketch = _

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    if (memoSketch == null || (memoBytes ne bytes)) {
      memoSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      memoBytes = bytes
    }
    memoSketch
  }

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    sketchOf(sketch.asInstanceOf[Array[Byte]])
      .estimateCount(item.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object SketchExpressions {
  private val CmsName = "graft_cms_estimate"

  /** Idempotently register and call `cms_estimate` as a column. */
  def cmsEstimate(spark: SparkSession, sketch: Column, item: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CmsName, exprs => CmsEstimate(exprs(0), exprs(1)), "scala_udf")
    call_function(CmsName, sketch, item)
  }
}
