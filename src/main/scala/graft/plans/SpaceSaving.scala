package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SpaceSaving (Metwally et al., ICDT '05) heavy-hitters sketch as a
  * native TypedImperativeAggregate — the Spark analog of the
  * reference's bounded-memory `approx_most_frequent`
  * (reference: presto-main/src/main/java/com/facebook/presto/operator/
  * aggregation/approxmostfrequent/ApproximateMostFrequent.java:73,
  * backed by its stream-summary histogram at :1).
  *
  * Properties:
  *  - state is at most `capacity` counters — O(capacity) memory per
  *    group regardless of input cardinality, so partial aggregation on
  *    a 1000-executor cluster ships KB-scale buffers while the exact
  *    two-phase alternative would shuffle one row per DISTINCT VALUE
  *    (the q94 caveat this sketch closes);
  *  - every reported count overestimates the true count by at most the
  *    counter's tracked `error`, and error ≤ N/capacity (the classic
  *    SpaceSaving bound);
  *  - when a group's distinct-value count never exceeds `capacity`, no
  *    eviction ever fires and the sketch is EXACT under any partitioning
  *    and merge order — the regime the DuckDB oracle pins (q109);
  *  - merge folds each incoming counter as a weighted insert (count and
  *    error add for shared values; an evicting insert inherits the
  *    victim's count as its error), preserving the overestimate
  *    invariant (Agarwal et al., "Mergeable Summaries", PODS '12).
  *
  * eval returns the top-`k` counters as array<struct<value, cnt>>
  * ordered by (cnt DESC, value ASC) — deterministic whenever counts
  * are exact; under eviction, ties among approximate counts follow the
  * same rule on the overestimates.
  *
  * Value type: BIGINT or INT (promoted) or STRING. Eviction scans for
  * the min-count entry (O(capacity)); a production-tuned variant keeps
  * the Stream-Summary doubly-linked bucket list for O(1) eviction —
  * same sketch contract, constant-factor only.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  require(capacity > 0, s"graft_approx_most_frequent requires capacity > 0, got $capacity")
  require(k > 0 && k <= capacity,
    s"graft_approx_most_frequent requires 0 < k <= capacity, got k=$k capacity=$capacity")

  private lazy val isString = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_approx_most_frequent requires bigint/int/string input, got $t")
  }
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", if (isString) StringType else LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_approx_most_frequent"

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity)

  override def update(buf: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) {
      val key: Any = v match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone() // row buffers are reused
        case i: java.lang.Integer => i.longValue: java.lang.Long
        case other => other
      }
      buf.insert(key, 1L, 0L)
    }
    buf
  }

  override def merge(buf: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    other.counters.foreach { case (v, c) => buf.insert(v, c.count, c.error) }
    buf
  }

  override def eval(buf: SpaceSavingState): Any = {
    val ord: Ordering[(Any, Counter)] = new Ordering[(Any, Counter)] {
      def compare(a: (Any, Counter), b: (Any, Counter)): Int = {
        val byCount = java.lang.Long.compare(b._2.count, a._2.count)
        if (byCount != 0) byCount
        else (a._1, b._1) match {
          case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
          case (x: org.apache.spark.unsafe.types.UTF8String,
                y: org.apache.spark.unsafe.types.UTF8String) => x.compareTo(y)
          case _ => 0
        }
      }
    }
    val top = buf.counters.toSeq.sorted(ord).take(k)
    new GenericArrayData(top.map { case (v, c) =>
      new GenericInternalRow(Array[Any](v, c.count))
    }.toArray[Any])
  }

  override def serialize(buf: SpaceSavingState): Array[Byte] = {
    val entries = buf.counters.toSeq
    if (isString) {
      val bytes = entries.map(_._1.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val bb = ByteBuffer.allocate(4 + entries.zip(bytes).map { case (_, b) => 4 + b.length + 16 }.sum)
      bb.putInt(entries.size)
      entries.zip(bytes).foreach { case ((_, c), b) =>
        bb.putInt(b.length); bb.put(b); bb.putLong(c.count); bb.putLong(c.error)
      }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(4 + entries.size * 24)
      bb.putInt(entries.size)
      entries.foreach { case (v, c) =>
        bb.putLong(v.asInstanceOf[java.lang.Long].longValue)
        bb.putLong(c.count); bb.putLong(c.error)
      }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new SpaceSavingState(capacity)
    var i = 0
    while (i < n) {
      val key: Any =
        if (isString) {
          val len = bb.getInt
          val b = new Array[Byte](len)
          bb.get(b)
          org.apache.spark.unsafe.types.UTF8String.fromBytes(b)
        } else (bb.getLong: java.lang.Long)
      val c = bb.getLong; val e = bb.getLong
      st.insert(key, c, e)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

final class Counter(var count: Long, var error: Long)

/** Bounded counter table: at most `capacity` live entries. */
final class SpaceSavingState(capacity: Int) {
  val counters: mutable.HashMap[Any, Counter] = mutable.HashMap.empty

  /** Weighted insert with error carry — both the per-row update
    * (w=1, e=0) and the merge fold (w=count, e=error) go through here.
    */
  def insert(v: Any, w: Long, e: Long): Unit = counters.get(v) match {
    case Some(c) => c.count += w; c.error += e
    case None if counters.size < capacity =>
      counters.update(v, new Counter(w, e))
    case None =>
      // evict the min-count entry; the newcomer inherits its count as
      // error (it may have occurred up to that many times unseen)
      var minKey: Any = null
      var min: Counter = null
      counters.foreach { case (key, c) =>
        if (min == null || c.count < min.count) { minKey = key; min = c }
      }
      counters.remove(minKey)
      counters.update(v, new Counter(min.count + w, min.count + e))
  }
}
