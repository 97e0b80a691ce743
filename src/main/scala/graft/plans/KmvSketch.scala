package graft.plans

import java.nio.ByteBuffer
import java.util.TreeSet

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k (KMV / "k minimum values") distinct-value sketch as a native
  * TypedImperativeAggregate — the Spark analog of the reference's theta
  * sketch + set digest surface (reference:
  * presto-docs/src/main/sphinx/functions/sketch.rst:14 `sketch_theta`,
  * presto-docs/src/main/sphinx/functions/setdigest.rst:1 MinHash set
  * digest). A theta sketch in its simplest exact form IS the bottom-k
  * sketch: keep the k smallest distinct hash values; every set
  * operation (union, intersection via Jaccard) and the cardinality
  * estimate (k−1)/θ derive from that state (Beyer et al., SIGMOD '07).
  *
  * Properties:
  *  - state is a bounded sorted set (≤ k longs) — O(k) memory per group
  *    regardless of input cardinality, so partial aggregation on a
  *    1000-executor cluster ships 1 KB-scale buffers, not values;
  *  - order-independent and duplicate-insensitive (pure min-k of a set),
  *    deterministic under any partitioning;
  *  - merge = set-union-then-trim (associative + commutative);
  *  - feeding the elements of several sketches back through the
  *    aggregate IS the lossless union merge — rollups need no second
  *    code path;
  *  - inputs are pre-hashed 60-bit values (the md5-derived
  *    `Sketches.hllHash` family), so every step is portable integer
  *    arithmetic and the DuckDB oracle replays the sketch bit-for-bit
  *    (`ORDER BY h LIMIT k` over distinct hashes).
  *
  * eval returns the sorted hash array (ascending); estimates and
  * Jaccard are derived by `Sketches.kmvEstimate` / `kmvJaccard`.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[java.lang.Long]] {

  require(k > 0, s"graft_kmv requires k > 0, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires an integral (pre-hashed) input, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): TreeSet[java.lang.Long] =
    new TreeSet[java.lang.Long]()

  private def insert(buf: TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values that can't make the bottom-k (the common case once the
    // sketch is warm — O(log k) compare, no churn)
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      if (buf.add(v)) buf.remove(buf.last)
      ()
    }
  }

  override def update(buf: TreeSet[java.lang.Long], input: InternalRow): TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val c = v match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
      }
      insert(buf, c)
    }
    buf
  }

  override def merge(buf: TreeSet[java.lang.Long], other: TreeSet[java.lang.Long]): TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next().longValue)
    buf
  }

  override def eval(buf: TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}
