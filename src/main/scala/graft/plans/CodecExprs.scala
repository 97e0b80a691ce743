package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_to_base32(varbinary) → varchar` — RFC 4648 §6 base32 encode as
  * a native codegen'd expression (reference surface: binary.rst
  * to_base32; reference impl presto-main/.../scalar/VarbinaryFunctions
  * .java:1 delegates to Guava's BaseEncoding — here the RFC's 5-bit
  * regrouping is implemented directly). The q156 SQL fold exists for the
  * cross-engine oracle; THIS is the form SQL users call (full binary
  * domain, one static-call per value inside WholeStageCodegen, and —
  * unlike a SQL-string composition — it nests under other graft
  * functions because resolution never re-renders children to SQL).
  */
case class Base32Encode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_to_base32 requires binary or string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_to_base32"

  override protected def nullSafeEval(v: Any): Any = v match {
    case b: Array[Byte] => Base32.encode(b)
    case s: UTF8String => Base32.encode(s.getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.plans.Base32.encode($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.plans.Base32.encode($c.getBytes())")
    }

  override protected def withNewChildInternal(newChild: Expression): Base32Encode =
    copy(child = newChild)
}

/** `graft_from_base32(varchar) → varbinary` — the RFC 4648 §6 decode.
  * Padding optional, rejects characters outside A–Z2–7/'=' (the
  * reference's strictness).
  */
case class Base32Decode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_from_base32 requires a string input, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_from_base32"

  override protected def nullSafeEval(v: Any): Any =
    Base32.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Base32.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): Base32Decode =
    copy(child = newChild)
}

object Base32 {
  private val Alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  // char → 5-bit value; -1 = invalid (‘=’ handled separately)
  private val Rev: Array[Byte] = {
    val r = Array.fill[Byte](128)(-1)
    Alpha.zipWithIndex.foreach { case (c, i) => r(c) = i.toByte }
    r
  }

  def encode(bytes: Array[Byte]): UTF8String = {
    val n = bytes.length
    val nc = (8 * n + 4) / 5
    val out = new Array[Byte](((n + 4) / 5) * 8)
    var acc = 0L
    var nbits = 0
    var o = 0
    var i = 0
    while (i < n) {
      acc = (acc << 8) | (bytes(i) & 0xffL); nbits += 8; i += 1
      while (nbits >= 5) {
        out(o) = Alpha.charAt(((acc >> (nbits - 5)) & 31).toInt).toByte
        o += 1; nbits -= 5
      }
    }
    if (nbits > 0) { out(o) = Alpha.charAt(((acc << (5 - nbits)) & 31).toInt).toByte; o += 1 }
    while (o < out.length) { out(o) = '='; o += 1 }
    assert(nc <= out.length)
    UTF8String.fromBytes(out)
  }

  def decode(s: UTF8String): Array[Byte] = {
    val in = s.getBytes
    var nc = in.length
    while (nc > 0 && in(nc - 1) == '=') nc -= 1
    val out = new Array[Byte]((5 * nc) / 8)
    var acc = 0L
    var nbits = 0
    var o = 0
    var i = 0
    while (i < nc) {
      val c = in(i) & 0xff
      val v = if (c < 128) Rev(c) else -1
      if (v < 0) throw new IllegalArgumentException(
        s"graft_from_base32: invalid base32 character '${c.toChar}'")
      acc = (acc << 5) | (v & 31L); nbits += 5; i += 1
      if (nbits >= 8) { out(o) = ((acc >> (nbits - 8)) & 0xff).toByte; o += 1; nbits -= 8 }
    }
    out
  }
}
