package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile sketch as a native TypedImperativeAggregate — the
  * Spark analog of the reference's mergeable approx_percentile state
  * (reference: presto-main/src/main/java/com/facebook/presto/operator/
  * aggregation/ApproximateLongPercentileAggregations.java:1, the
  * qdigest family presto-docs/src/main/sphinx/functions/qdigest.rst:35,
  * and TDigestAggregationFunction.java:1's user-chosen accuracy knob).
  *
  * The sketch is an HDR-histogram-style log-linear bucket array over
  * non-negative integer inputs (e.g. money in cents), parameterized by
  * `bits` — the number of mantissa bits per exponent (the
  * user-chosen-accuracy surface of qdigest/tdigest):
  *   - values 0 .. 2^bits−1 get exact buckets;
  *   - larger values bucket by (exponent, top-`bits` mantissa bits);
  *   - relative error ≤ 2^−(bits+1) per estimate
  *     (bits=3 → ≤6.25%, 512 slots / 4 KB; bits=6 → ≤0.78%,
  *     4096 slots / 32 KB) — state stays FIXED-size per group
  *     regardless of input cardinality.
  *
  * Properties the specs rely on:
  *  - order-independent and duplicate-insensitive-free (pure counts), so
  *    results are deterministic under any partitioning — unlike
  *    t-digest/GK whose state depends on insertion order;
  *  - merge = elementwise add (associative + commutative), giving exact
  *    partial aggregation on a 1000-executor cluster;
  *  - every step is integer arithmetic, so the DuckDB oracle replays the
  *    sketch exactly (floor(log2(c)) is ulp-safe for c < 2^40);
  *  - weighted insert (the qdigest weight/scale surface): a weight-w
  *    row is exactly w unit rows, so scale_qdigest is weight scaling
  *    and quantiles are invariant under uniform scaling.
  *
  * eval returns the bucket-midpoint value (in input units, as double) at
  * rank ceil(q·n); null for an empty group.
  */
case class HdrQuantileAgg(
    child: Expression,
    q: Double,
    bits: Int = 3,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with HdrBuffer {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hdr_quantile"

  override def eval(buf: Array[Long]): Any = {
    val n = total(buf)
    if (n == 0) return null
    pick(buf, q, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrQuantileAgg =
    copy(child = newChildren.head)
}

/** Weighted-insert form (qdigest.rst weighted add / scale_qdigest): each
  * row contributes `weight` occurrences of `child`. Null or non-positive
  * weights contribute nothing.
  */
case class HdrWeightedQuantileAgg(
    child: Expression,
    weight: Expression,
    q: Double,
    bits: Int = 3,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with HdrBuffer {

  override protected def weightExpr: Option[Expression] = Some(weight)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hdr_quantile_w"

  override def eval(buf: Array[Long]): Any = {
    val n = total(buf)
    if (n == 0) return null
    pick(buf, q, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrWeightedQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrWeightedQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HdrWeightedQuantileAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}

/** values_at_quantiles (qdigest.rst/tdigest.rst surface): one sketch
  * build, one buffer walk per requested quantile, array<double> out —
  * the multi-quantile form that saves N−1 sketch builds over calling
  * [[HdrQuantileAgg]] N times.
  */
case class HdrQuantilesAgg(
    child: Expression,
    qs: Seq[Double],
    bits: Int = 3,
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
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      qs.map(q => pick(buf, q, n)).toArray)
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
    bits: Int = 3,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with HdrBuffer {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hdr_rank"

  override def eval(buf: Array[Long]): Any = {
    val n = total(buf)
    if (n == 0) return null
    val b = HdrQuantileAgg.bucketOf(value, bits)
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

/** Shared HDR register-array buffer plumbing (update/merge/serde/rank
  * walk) for the quantile-family aggregates, parameterized by the
  * `bits` resolution.
  */
trait HdrBuffer { self: TypedImperativeAggregate[Array[Long]] =>
  def child: Expression
  def bits: Int
  protected def weightExpr: Option[Expression] = None

  protected final def slotCount: Int = HdrQuantileAgg.slots(bits)

  override def checkInputDataTypes(): TypeCheckResult = {
    require(bits >= 1 && bits <= 6,
      s"$prettyName resolution must be 1..6 mantissa bits, got $bits")
    (child.dataType, weightExpr.map(_.dataType)) match {
      case (LongType | IntegerType, None | Some(LongType) | Some(IntegerType)) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral input (and weight), got $t${w.fold("")(x => s", $x")}")
    }
  }
  def children: Seq[Expression] = child +: weightExpr.toSeq
  def nullable: Boolean = true

  final def createAggregationBuffer(): Array[Long] = new Array[Long](slotCount)

  private def longOf(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue
    case i: java.lang.Integer => i.longValue
  }

  final def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = weightExpr match {
        case None => 1L
        case Some(e) => e.eval(input) match {
          case null => 0L
          case x => longOf(x)
        }
      }
      if (w > 0) buf(HdrQuantileAgg.bucketOf(longOf(v), bits)) += w
    }
    buf
  }

  final def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < slotCount) { buf(i) += other(i); i += 1 }
    buf
  }

  final protected def total(buf: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < slotCount) { n += buf(i); i += 1 }
    n
  }

  /** Midpoint of the first bucket whose cumulative count reaches rank
    * ceil(q·n).
    */
  final protected def pick(buf: Array[Long], q: Double, n: Long): Double = {
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < slotCount) {
      cum += buf(i)
      if (cum >= rank) return HdrQuantileAgg.midpoint(i, bits)
      i += 1
    }
    HdrQuantileAgg.midpoint(slotCount - 1, bits)
  }

  final def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(slotCount * 8)
    var i = 0
    while (i < slotCount) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  final def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](slotCount)
    var i = 0
    while (i < slotCount) { buf(i) = bb.getLong(); i += 1 }
    buf
  }
}

object HdrQuantileAgg {
  /** Slot count at the default 3-bit resolution (compat constant). */
  val Slots = 512

  /** 2^bits sub-buckets × exponents 0–63. */
  def slots(bits: Int): Int = (1 << bits) * 64

  /** bucket(c) at `bits` resolution: c in [0, 2^bits) exact; else
    * 2^bits·floor(log2 c) + top-`bits`-mantissa-bits − 2^bits. Negative
    * inputs clamp to 0 (sketch domain is counts / cents ≥ 0).
    */
  def bucketOf(c: Long, bits: Int): Int = {
    val sub = 1 << bits
    if (c < sub) math.max(0, c).toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(c)
      (sub * e + (c >>> (e - bits)).toInt - sub).min(slots(bits) - 1)
    }
  }

  /** 3-bit default (existing call sites / oracle helpers). */
  def bucketOf(c: Long): Int = bucketOf(c, 3)

  /** Midpoint of the bucket's value range (exact small buckets return
    * the value itself).
    */
  def midpoint(bucket: Int, bits: Int): Double = {
    val sub = 1 << bits
    if (bucket < sub) bucket.toDouble
    else {
      val e = bucket / sub
      val s = bucket % sub
      val base = 1L << (e - bits)
      (sub + s) * base + base * 0.5
    }
  }

  def midpoint(bucket: Int): Double = midpoint(bucket, 3)
}
