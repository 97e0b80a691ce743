package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of `array<double>` rows per group — the Lloyd-round
  * centroid update (Ann.centroidMean), as a TypedImperativeAggregate
  * over one primitive `double[]` state per group.
  *
  * Why not the declarative zip_with fold (the r8 spelling, via
  * Reduce.reduceAgg): an ArrayType aggregation buffer is not a mutable
  * UnsafeRow field, so every input row re-evaluated the zip_with lambda
  * into a fresh array AND re-serialized the buffer row — per-row
  * allocation proportional to dim that showed up as 590 ms of driver GC
  * inside q142's timed runs (r8 VERDICT). Here the per-row update is a
  * bare `state(i) += arr.getDouble(i)` loop into a reused primitive
  * buffer: zero per-row allocation, and the map-side partial still
  * ships one (dim+1)-double state per group — the same single-shuffle
  * Lloyd round at 100 TB.
  *
  * State layout: `[count, sum_0, …, sum_{dim-1}]`, sized lazily from
  * the first row (so the vector dimension always comes from the DATA —
  * the r8 ADVICE null-pad class of bug cannot exist here). Mixed
  * dimensions or null elements fail fast with an exception instead of
  * silently nulling the centroid. Merge is element-wise add:
  * associative and commutative, exact partial aggregation under any
  * partitioning.
  */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_mean"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.sql}")
  }

  /** Empty = unsized — no row seen yet; the first row fixes the dim. */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](n + 1) else buf
    if (b.length != n + 1) throw new IllegalArgumentException(
      s"$prettyName: mixed vector dimensions (${b.length - 1} vs $n)")
    b(0) += 1.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"$prettyName: null element at index $i")
      b(i + 1) += arr.getDouble(i)
      i += 1
    }
    b
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other.clone()
    if (buf.length != other.length) throw new IllegalArgumentException(
      s"$prettyName: mixed vector dimensions (${buf.length - 1} vs ${other.length - 1})")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty || buf(0) == 0.0) return null
    val cnt = buf(0)
    val out = new Array[Double](buf.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buf(i + 1) / cnt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMeanAgg =
    copy(child = newChildren.head)
}

object VecMeanAgg {
  /** Column face: element-wise mean of an array<double> column. */
  def vecMean(c: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      VecMeanAgg(org.apache.spark.sql.GraftSqlShims.expression(c))
        .toAggregateExpression())
}
