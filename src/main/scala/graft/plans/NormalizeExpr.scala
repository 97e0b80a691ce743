package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize(string[, form])` — Unicode text normalization to one
  * of the four standard forms NFC / NFD / NFKC / NFKD (default NFC),
  * matching the reference surface (reference
  * presto-docs/src/main/sphinx/functions/string.rst `normalize`;
  * reference impl presto-main/.../scalar/StringFunctions.java:829
  * delegates to `java.text.Normalizer` — the JDK built-in, used here
  * identically, so outputs match the reference digit-for-digit on the
  * same JDK Unicode tables).
  *
  * Normalization-before-dedup is standard web-corpus practice (C4/CCNet
  * normalize text before exact/MinHash dedup), so this runs once per
  * document in a pipeline hot path: a UnaryExpression with doGenCode
  * keeps the call inside WholeStageCodegen. An unknown form name is
  * rejected at expression-construction time (analysis, not runtime),
  * mirroring the reference's INVALID_FUNCTION_ARGUMENT behavior.
  */
case class Normalize(child: Expression, form: String) extends UnaryExpression {
  // fail fast on a bad form so the error surfaces at analysis time
  private val targetForm: Normalizer.Form =
    try Normalizer.Form.valueOf(form)
    catch {
      case _: IllegalArgumentException => throw new IllegalArgumentException(
        s"graft_normalize: form must be one of [NFD, NFC, NFKD, NFKC], got '$form'")
    }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_normalize requires a string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(v: Any): Any =
    Normalize.compute(v.asInstanceOf[UTF8String], targetForm.ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Normalize.compute($c, ${targetForm.ordinal})")

  override protected def withNewChildInternal(newChild: Expression): Normalize =
    copy(child = newChild)
}

object Normalize {
  // ordinal-indexed so the codegen call site passes a constant int
  private val forms: Array[Normalizer.Form] = Normalizer.Form.values()

  def compute(s: UTF8String, formOrdinal: Int): UTF8String = {
    val str = s.toString
    // fast path: pure-ASCII strings are normalization-invariant in every
    // form — skip the Normalizer call (the overwhelmingly common case in
    // a web corpus, and isNormalized's own first check walks the chars)
    var i = 0
    var ascii = true
    while (ascii && i < str.length) {
      if (str.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(Normalizer.normalize(str, forms(formOrdinal)))
  }
}
