package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `topk(col, k)` keeps the k largest
  * (or smallest) values per group, as a sorted array.
  *
  * Why a custom `TypedImperativeAggregate` rather than the window idiom
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`): the window
  * form SHUFFLES AND SORTS EVERY ROW of every group before discarding all
  * but k of them, while an aggregate gets map-side partial aggregation —
  * each input partition reduces to ≤ k values per group before the
  * exchange, so shuffle volume is O(groups·k) instead of O(rows). At 100 TB
  * that is the difference between a top-k and a global sort. (Same
  * state-bound argument as Spark's own `ApproximatePercentile`; the buffer
  * serialization pattern follows `Collect`.)
  *
  * Determinism: output is values only, sorted by the aggregate's ordering —
  * ties between equal values are indistinguishable in the output, so the
  * result is deterministic for any input order (differential-testable).
  * Nulls are skipped (SQL aggregate convention).
  */
case class TopK(
    child: Expression,
    k: Int,
    descending: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(k >= 1, s"topk requires k >= 1, got $k")

  // keep the buffer bounded: prune to k whenever it doubles past 2k
  private val pruneAt: Int = math.max(2 * k, 64)

  @transient private lazy val baseOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  /** best-first: the order the output array is emitted in */
  @transient private lazy val bestFirst: Ordering[Any] =
    if (descending) baseOrdering.reverse else baseOrdering

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  private def prune(buf: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    if (buf.length > k) {
      val kept = buf.sorted(bestFirst).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) {
      buf += InternalRow.copyValue(v)
      if (buf.length >= pruneAt) prune(buf)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    buf ++= other
    prune(buf)
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.sorted(bestFirst).take(k).toArray)

  // built once per task, NOT per serialize() call — UnsafeProjection.create
  // is a codegen compile, and the sort-based agg fallback serializes every
  // group buffer (a per-call create cost thousands of Janino compiles)
  @transient private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(
      Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    prune(buf)
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = mutable.ArrayBuffer.empty[Any]
    arr.foreach(child.dataType, (_, v) => buf += InternalRow.copyValue(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopK =
    copy(child = newChild)
}
