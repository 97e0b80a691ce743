package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}

/** Distributed Bloom filter build + membership test — the runtime-filter
  * / dynamic-filtering pattern: build a compact set summary of a join's
  * small side, broadcast it, and drop non-matching fact rows MAP-SIDE
  * before they ever reach the join shuffle. The reference applies the
  * same idea as dynamic filtering on its joins
  * (reference: presto-main/src/main/java/com/facebook/presto/operator/
  * JoinOperator's dynamic filter support and presto-main/.../
  * DynamicFilterSourceOperator.java:1); Spark's own runtime row-level
  * filtering is driven by the cost-based optimizer — this operator makes
  * the pattern explicit and caller-controlled.
  *
  * Layout: `numBits` bit array as long words, k double-hashed probe
  * positions per value (h1 + i·h2 over two xxhash64 seeds — Kirsch &
  * Mitzenmacher's standard construction). Keys are int64 (join keys
  * here); state is a fixed `numBits/8`-byte buffer per group, merge is
  * bitwise OR — associative/commutative, so partial aggregation ships
  * KB–MB-scale partials no matter the build-side row count.
  */
object GraftBloom {
  final val Seed1 = 0x9e3779b97f4a7c15L
  final val Seed2 = 0xc2b2ae3d27d4eb4fL

  def add(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h1 = XXH64.hashLong(v, Seed1)
    val h2 = XXH64.hashLong(v, Seed2)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Static so generated code can call it: one branch per probe, no
    * allocation. `bytes` is the serialized word array (little-endian).
    */
  def mightContain(bytes: Array[Byte], numHashes: Int, v: Long): Boolean = {
    val numBits = bytes.length * 8
    val h1 = XXH64.hashLong(v, Seed1)
    val h2 = XXH64.hashLong(v, Seed2)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      val b = bytes(pos >>> 3)
      if (((b >>> (pos & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }
}

/** Aggregate: fold int64 keys into a Bloom bit array; returns the
  * serialized filter (BinaryType). numBits must be a multiple of 64.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")

  override def prettyName: String = "graft_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) GraftBloom.add(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = GraftBloom.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = GraftBloom.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = GraftBloom.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0))
}

/** Scalar membership probe, codegen'd (it sits in the fact-scan hot
  * path): emits a static call to [[GraftBloom.mightContain]].
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int = 5)
  extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    GraftBloom.mightContain(bloom.asInstanceOf[Array[Byte]], numHashes,
      v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftBloom.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (b, v) => s"$cls.mightContain($b, $numHashes, $v)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}
