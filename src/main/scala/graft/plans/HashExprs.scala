package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType}

/** 128-bit and keyed hash kernels matching the reference's varbinary
  * hash surface:
  *
  *  - `graft_murmur3_x64_128(bin)` — MurmurHash3_x64_128 (reference
  *    presto-main/.../scalar/VarbinaryFunctions.java:303, which runs
  *    Guava's murmur3_128 = the public Austin Appleby MurmurHash3
  *    x64_128 algorithm, seed 0). Output is the 16-byte
  *    little-endian(h1) || little-endian(h2) layout the reference
  *    emits. Implemented here directly from the published algorithm
  *    (MurmurHash3.cpp, public domain spec) — constants are part of
  *    the algorithm definition.
  *  - `graft_hmac_md5/sha1/sha256/sha512(bin, key)` — RFC 2104 HMAC
  *    (reference presto-main/.../scalar/HmacFunctions.java:1). Built
  *    from the RFC construction H((K' ^ opad) || H((K' ^ ipad) || m))
  *    over JDK MessageDigest — deliberately NOT javax.crypto.Mac, so
  *    the ScalaTest parity check against Mac compares two independent
  *    implementations.
  *
  * Both are per-row kernels on the fingerprinting hot path (128-bit
  * doc fingerprints feed exact dedup at 100 TB where 64 bits start to
  * birthday-collide), so they are codegen'd expressions: one static
  * call per value inside WholeStageCodegen, no interpreted lambda.
  */
case class Murmur3X64128(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_murmur3_x64_128 requires a binary input, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_murmur3_x64_128"

  override protected def nullSafeEval(v: Any): Any =
    Murmur3X64128.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Murmur3X64128.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Murmur3X64128 =
    copy(child = newChild)
}

object Murmur3X64128 {
  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  private def littleLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  /** MurmurHash3_x64_128 with seed 0 over the full byte array. */
  def compute(data: Array[Byte]): Array[Byte] = {
    val len = data.length
    var h1 = 0L
    var h2 = 0L
    val nBlocks = len / 16
    var i = 0
    while (i < nBlocks) {
      var k1 = littleLong(data, i * 16)
      var k2 = littleLong(data, i * 16 + 8)
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tailStart = nBlocks * 16
    val tailLen = len - tailStart
    var k1 = 0L
    var k2 = 0L
    if (tailLen > 8) {
      var j = tailLen - 1
      while (j >= 8) { k2 = (k2 << 8) | (data(tailStart + j) & 0xffL); j -= 1 }
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (tailLen > 0) {
      var j = math.min(tailLen, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | (data(tailStart + j) & 0xffL); j -= 1 }
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len; h2 ^= len
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    val out = new Array[Byte](16)
    var b = 0
    while (b < 8) {
      out(b) = (h1 >>> (8 * b)).toByte
      out(8 + b) = (h2 >>> (8 * b)).toByte
      b += 1
    }
    out
  }
}

/** RFC 2104 HMAC over a JDK MessageDigest. `algo` is one of
  * MD5 / SHA-1 / SHA-256 / SHA-512 (validated at construction, so a
  * typo fails at analysis time, matching the reference's static
  * per-algorithm function surface).
  */
case class HmacHash(left: Expression, right: Expression, algo: String)
    extends BinaryExpression {
  private val blockSize: Int = HmacHash.blockSizes.getOrElse(algo,
    throw new IllegalArgumentException(
      s"graft_hmac: algo must be one of ${HmacHash.blockSizes.keys.mkString(", ")}, got '$algo'"))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hmac requires (binary data, binary key), got ($l, $r)")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = s"graft_hmac_${algo.replace("-", "").toLowerCase}"

  override protected def nullSafeEval(data: Any, key: Any): Any =
    HmacHash.compute(data.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Array[Byte]], algo, blockSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, k) =>
      s"""graft.plans.HmacHash.compute($d, $k, "$algo", $blockSize)""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HmacHash =
    copy(left = newLeft, right = newRight)
}

object HmacHash {
  /** Digest block sizes in bytes (RFC 2104 B): 64 for the MD5/SHA-1/
    * SHA-256 family, 128 for SHA-512. */
  val blockSizes: Map[String, Int] =
    Map("MD5" -> 64, "SHA-1" -> 64, "SHA-256" -> 64, "SHA-512" -> 128)

  /** H((K' ^ opad) || H((K' ^ ipad) || m)) with K' the key hashed (if
    * longer than B) then zero-padded to B. */
  def compute(data: Array[Byte], key: Array[Byte], algo: String,
              blockSize: Int): Array[Byte] = {
    val md = MessageDigest.getInstance(algo)
    val k0 = if (key.length > blockSize) md.digest(key) else key
    val ipad = new Array[Byte](blockSize)
    val opad = new Array[Byte](blockSize)
    var i = 0
    while (i < blockSize) {
      val kb = if (i < k0.length) k0(i) else 0: Byte
      ipad(i) = (kb ^ 0x36).toByte
      opad(i) = (kb ^ 0x5c).toByte
      i += 1
    }
    md.reset()
    md.update(ipad)
    md.update(data)
    val inner = md.digest()
    md.reset()
    md.update(opad)
    md.update(inner)
    md.digest()
  }
}
