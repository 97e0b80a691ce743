package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/sketch kernels of the
  * LLM-pipeline operators.
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * CodegenFallback: every lambda application is an interpreted closure
  * call. That is fine for per-document feature extraction, but the
  * similarity kernels run once per CANDIDATE PAIR — millions of times per
  * partition at corpus scale — so they are implemented here as
  * BinaryExpression/UnaryExpression with doGenCode: the whole kernel
  * inlines into WholeStageCodegen as a tight primitive loop (the same
  * reasoning the reference applies in its columnar kernels, e.g.
  * presto-main/src/main/java/com/facebook/presto/operator/scalar/
  * MathFunctions.java:1 — scalar kernels compiled, not interpreted).
  *
  * Hash semantics are bit-identical to the HOF formulations in
  * graft.functions.Sketches (asserted by SketchParitySpec): the sketch
  * hash is Spark's xxhash64 chain — XXH64(seed 42) over the UTF8 bytes,
  * then XXH64.hashInt with the slot index.
  *
  * Input arrays must not contain null elements (the corpus contract:
  * words()/embedding columns are never element-null).
  */

/** cosine(a, b) over two array<double> columns: fused dot + norms in one
  * pass, no intermediate arrays.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires two array<double> inputs, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // null on dimension mismatch (not just null inputs)
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    // mismatched dimensions → null, matching the HOF formulation's
    // zip_with null padding — dimension bugs surface instead of
    // silently scoring a truncated prefix
    if (x.numElements() != y.numElements()) null
    else CosineSim.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.plans.CosineSim.compute($a, $b);
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** k-slot MinHash signature of an array<string>: sig[i] = min over
  * elements of xxhash64(elem, i). One UTF8 hash per element, then k
  * cheap integer mixes — O(n + n·k) integer ops, no per-slot re-hash of
  * the bytes and no interpreted lambdas.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires an array<string> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.MinHashSig.compute($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    // empty input → k null slots (matches array_min(empty) = null in the
    // HOF formulation)
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h0 = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, h0)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash of an array<string>: per-bit majority vote over
  * element hashes. One UTF8 hash + 64 shifts per element.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires an array<string> input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SimHash64.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Deterministic affine-permutation constants for the ORACLE-ABLE sketch
  * family (MinHashAffine / SimHashBits). Unlike the xxhash64 kernels
  * above, every step of this scheme is expressible in portable SQL
  * (md5 → 60-bit int → affine mix mod 2^31−1), so the DuckDB oracle can
  * replay the whole dedup pipeline — the driver's strongest check.
  * The xxhash64 kernels remain the faster non-oracled variant.
  */
object Affine {
  /** Mersenne prime 2^31 − 1: (a·h + b) % P stays within 2^62 for
    * h, a < P, so the mix needs no modmul tricks in SQL or Java.
    */
  val P = 2147483647L
  /** Knuth multiplicative constant spreads slot indices; +1 keeps a ≠ 0. */
  def a(i: Int): Long = (2654435761L * (i + 1)) % (P - 1) + 1
  def b(i: Int): Long = (2654435761L * 40503L * (i + 1)) % P
}

/** sig[i] = min over h in the input array<bigint> (pre-reduced mod P) of
  * (a_i·h + b_i) mod P — the SQL-replayable MinHash. Empty input → k
  * null slots.
  */
case class MinHashAffine(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_affine requires an array<bigint> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_affine"

  override protected def nullSafeEval(v: Any): Any =
    MinHashAffine.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.MinHashAffine.compute($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashAffine =
    copy(child = newChild)
}

object MinHashAffine {
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < k) {
      val a = Affine.a(i); val b = Affine.b(i)
      var j = 0
      while (j < n) {
        val h = (a * arr.getLong(j) + b) % Affine.P
        if (h < mins(i)) mins(i) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Majority-vote SimHash over the low `bits` bits of pre-hashed
  * array<bigint> elements — the SQL-replayable SimHash (60 bits: the
  * md5-derived base hash carries 15 hex digits). Tie → bit unset,
  * matching 2·count > n in SQL.
  */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_bits requires an array<bigint> input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_bits"

  override protected def nullSafeEval(v: Any): Any =
    SimHashBits.compute(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SimHashBits.compute($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      j += 1
    }
    var res = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > n) res |= (1L << b)
      b += 1
    }
    res
  }
}

object SimHash64 {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) res |= (1L << b)
      b += 1
    }
    res
  }
}
