package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.{lang => jl}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra–Gries summary — the sketch core, Spark-free. At most `k`
  * counters + the total item count; `update` is the classic decrement-all
  * step, `mergeIn` the PODS'12 mergeable-summary combination (sum, then
  * subtract the (k+1)-th largest count so the result is again a valid
  * k-summary). Guarantee: every estimate undercounts its item's true
  * frequency by at most n/(k+1), so anything with true frequency >
  * n/(k+1) is present.
  *
  * The decrement-all step is O(k) but fires at most n/(k+1) times over n
  * updates (each step removes k+1 units of mass), so update cost is
  * amortized O(1)/row with zero allocation — an in-place entrySet walk,
  * not a map rebuild.
  */
final class MGSummary(val k: Int) {
  require(k > 0, "k must be positive")

  private val counters = new java.util.HashMap[String, jl.Long](2 * k)
  private var count: Long = 0L

  /** Total items observed. */
  def total: Long = count

  def update(tok: String): Unit = {
    count += 1L
    val cur = counters.get(tok)
    if (cur != null) { counters.put(tok, cur + 1L); return }
    if (counters.size < k) { counters.put(tok, jl.Long.valueOf(1L)); return }
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue - 1L
      if (v <= 0L) it.remove() else e.setValue(v)
    }
  }

  def mergeIn(o: MGSummary): Unit = {
    count += o.count
    val it = o.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counters.get(e.getKey)
      counters.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counters.size > k) {
      // subtract the (k+1)-th largest count from everything; ≤0 drops out
      val vals = counters.values().toArray(new Array[jl.Long](0))
      java.util.Arrays.sort(vals, java.util.Collections.reverseOrder[jl.Long]())
      val cut = vals(k).longValue()
      val it2 = counters.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val v = e.getValue - cut
        if (v <= 0L) it2.remove() else e.setValue(v)
      }
    }
  }

  /** (token, estimate), sorted by (-estimate, token). */
  def sorted: Seq[(String, Long)] = {
    val b = Seq.newBuilder[(String, Long)]
    val it = counters.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.longValue()) }
    b.result().sortBy { case (t, v) => (-v, t) }
  }

  def serialized: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(count); out.writeInt(counters.size)
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }
}

object MGSummary {
  def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MGSummary(in.readInt())
    s.count = in.readLong()
    var m = in.readInt()
    while (m > 0) { s.counters.put(in.readUTF(), in.readLong()); m -= 1 }
    s
  }
}

/** Misra–Gries heavy hitters as a `TypedImperativeAggregate`: the buffer
  * is a LIVE [[MGSummary]] object for a partition's whole run of rows —
  * update touches one hash entry in place — and serialization happens only
  * at shuffle boundaries (k-entry summaries, the 100 TB shape: partials
  * merge map-side, O(k) state crosses the wire). The r5 formulation was a
  * typed `Aggregator`, whose immutable buffer is encoder-round-tripped
  * (the whole k-entry map deserialized and re-serialized) around EVERY
  * input row — O(k) serialization per row regardless of how cheap reduce
  * itself is. Measured in `ScaleCheck` (hh_eviction_microbench +
  * q102_eviction_regime).
  *
  * Determinism note: when the distinct-item count never exceeds k, no
  * decrement ever fires anywhere (partials included) and the sketch is
  * EXACT regardless of partitioning/merge order — the basis for q102's
  * hash-matched oracle on the bounded-vocabulary corpus; the eviction
  * regime's n/(k+1) guarantee is spec-asserted on synthetic data.
  *
  * Output: `array<struct<_1: string, _2: bigint>>` sorted by (-count,
  * token) — the same shape the r5 Aggregator emitted.
  */
case class HeavyHittersAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", StringType), StructField("_2", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(b: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) b.update(v.toString)
    b
  }

  override def merge(b: MGSummary, o: MGSummary): MGSummary = { b.mergeIn(o); b }

  override def eval(b: MGSummary): Any =
    new GenericArrayData(b.sorted.map { case (t, v) =>
      InternalRow(UTF8String.fromString(t), v): Any }.toArray)

  override def serialize(b: MGSummary): Array[Byte] = b.serialized
  override def deserialize(bytes: Array[Byte]): MGSummary = MGSummary.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HeavyHittersAgg = copy(child = c(0))
}

object HeavyHitters {
  private val FnName = "graft_heavy_hitters"

  /** The sketch as a Column: `agg(HeavyHitters.sketch(spark, col, k))`.
    * Registered in the session function registry, so it is callable from
    * SQL too; `k` must be an integer literal.
    */
  def sketch(spark: SparkSession, col: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(FnName,
      exprs => {
        val kk = exprs(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitters k must be an int literal, got $other")
        }
        HeavyHittersAgg(exprs(0), kk)
      }, "scala_udf")
    call_function(FnName, col, lit(k))
  }
}
