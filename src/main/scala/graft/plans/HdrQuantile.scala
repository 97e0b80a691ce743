package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile sketch as a native TypedImperativeAggregate — the
  * Spark analog of the reference's mergeable approx_percentile state
  * (reference: presto-main/src/main/java/com/facebook/presto/operator/
  * aggregation/ApproximateLongPercentileAggregations.java:1, qdigest
  * family).
  *
  * The sketch is an HDR-histogram-style log-linear bucket array over
  * non-negative integer inputs (e.g. money in cents): values 0–7 get
  * exact buckets; larger values bucket by (exponent, top-3-mantissa-bits)
  * — bucket = 8·e + sub — giving ≤ 6.25% relative error per estimate with
  * a FIXED 512-slot state (4 KB), regardless of input cardinality.
  *
  * Properties the specs rely on:
  *  - order-independent and duplicate-insensitive-free (pure counts), so
  *    results are deterministic under any partitioning — unlike
  *    t-digest/GK whose state depends on insertion order;
  *  - merge = elementwise add (associative + commutative), giving exact
  *    partial aggregation on a 1000-executor cluster;
  *  - every step is integer arithmetic, so the DuckDB oracle replays the
  *    sketch exactly (floor(log2(c)) is ulp-safe for c < 2^40).
  *
  * eval returns the bucket-midpoint value (in input units, as double) at
  * rank ceil(q·n); null for an empty group.
  */
case class HdrQuantileAgg(
    child: Expression,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hdr_quantile requires an integral input, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hdr_quantile"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](HdrQuantileAgg.Slots)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val c = v match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
      }
      buf(HdrQuantileAgg.bucketOf(c)) += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < HdrQuantileAgg.Slots) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < HdrQuantileAgg.Slots) { n += buf(i); i += 1 }
    if (n == 0) return null
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    i = 0
    while (i < HdrQuantileAgg.Slots) {
      cum += buf(i)
      if (cum >= rank) return HdrQuantileAgg.midpoint(i)
      i += 1
    }
    HdrQuantileAgg.midpoint(HdrQuantileAgg.Slots - 1)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(HdrQuantileAgg.Slots * 8)
    var i = 0
    while (i < HdrQuantileAgg.Slots) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](HdrQuantileAgg.Slots)
    var i = 0
    while (i < HdrQuantileAgg.Slots) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrQuantileAgg =
    copy(child = newChildren.head)
}

/** values_at_quantiles (qdigest.rst/tdigest.rst surface): one sketch
  * build, one buffer walk per requested quantile, array<double> out —
  * the multi-quantile form that saves N−1 sketch builds over calling
  * [[HdrQuantileAgg]] N times.
  */
case class HdrQuantilesAgg(
    child: Expression,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with HdrBuffer {

  require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
    s"quantiles must be in [0, 1], got $qs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hdr_quantiles"

  override def eval(buf: Array[Long]): Any = {
    val n = total(buf)
    if (n == 0) return null
    val out = qs.map { q =>
      val rank = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      var i = 0
      var res = HdrQuantileAgg.midpoint(HdrQuantileAgg.Slots - 1)
      var done = false
      while (i < HdrQuantileAgg.Slots && !done) {
        cum += buf(i)
        if (cum >= rank) { res = HdrQuantileAgg.midpoint(i); done = true }
        i += 1
      }
      res
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrQuantilesAgg =
    copy(child = newChildren.head)
}

/** quantile_at_value (qdigest.rst surface): the estimated rank of a
  * value — fraction of inputs in buckets at or below the value's bucket.
  * "At bucket resolution" is the sketch contract: every member of the
  * value's own bucket counts as ≤ it, exactly as the oracle replays.
  */
case class HdrRankAgg(
    child: Expression,
    value: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with HdrBuffer {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hdr_rank"

  override def eval(buf: Array[Long]): Any = {
    val n = total(buf)
    if (n == 0) return null
    val b = HdrQuantileAgg.bucketOf(value)
    var cum = 0L
    var i = 0
    while (i <= b) { cum += buf(i); i += 1 }
    cum.toDouble / n.toDouble
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrRankAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrRankAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrRankAgg =
    copy(child = newChildren.head)
}

/** Shared HDR register-array buffer plumbing (update/merge/serde) for
  * the quantile-family aggregates.
  */
trait HdrBuffer { self: TypedImperativeAggregate[Array[Long]] =>
  def child: Expression

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral input, got $t")
  }
  def children: Seq[Expression] = Seq(child)
  def nullable: Boolean = true

  final def createAggregationBuffer(): Array[Long] =
    new Array[Long](HdrQuantileAgg.Slots)

  final def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val c = v match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
      }
      buf(HdrQuantileAgg.bucketOf(c)) += 1
    }
    buf
  }

  final def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < HdrQuantileAgg.Slots) { buf(i) += other(i); i += 1 }
    buf
  }

  final protected def total(buf: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < HdrQuantileAgg.Slots) { n += buf(i); i += 1 }
    n
  }

  final def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(HdrQuantileAgg.Slots * 8)
    var i = 0
    while (i < HdrQuantileAgg.Slots) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  final def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](HdrQuantileAgg.Slots)
    var i = 0
    while (i < HdrQuantileAgg.Slots) { buf(i) = bb.getLong(); i += 1 }
    buf
  }
}

object HdrQuantileAgg {
  /** 8 sub-buckets × exponents 0–62 + the 8 exact small-value slots. */
  val Slots = 512

  /** bucket(c): c in [0,8) exact; else 8·floor(log2 c) + top-3-mantissa
    * bits − 8. Negative inputs clamp to 0 (sketch domain is counts /
    * cents ≥ 0).
    */
  def bucketOf(c: Long): Int = {
    if (c < 8) math.max(0, c).toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(c)
      (8 * e + (c >>> (e - 3)).toInt - 8).min(Slots - 1)
    }
  }

  /** Midpoint of the bucket's value range (exact small buckets return
    * the value itself).
    */
  def midpoint(bucket: Int): Double = {
    if (bucket < 8) bucket.toDouble
    else {
      val e = bucket / 8
      val sub = bucket % 8
      val base = 1L << (e - 3)
      (8 + sub) * base + base * 0.5
    }
  }
}
