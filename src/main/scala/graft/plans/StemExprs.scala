package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_word_stem(word)` — English Porter stemmer as a native
  * codegen'd expression (reference surface:
  * presto-docs/src/main/sphinx/functions/string.rst:258 `word_stem`;
  * reference impl presto-main/.../scalar/WordStemFunction.java:1
  * delegates to a Snowball stemmer — here the original algorithm from
  * Porter, "An algorithm for suffix stripping", Program 14(3) 1980, is
  * implemented directly, original-paper rule set, no departures).
  *
  * Stemming is a per-token hot loop in text pipelines (every word of
  * every document), so like the sketch kernels this is a
  * UnaryExpression with doGenCode — the stemmer inlines into
  * WholeStageCodegen instead of paying an interpreted-lambda call per
  * word. Input is lowercased first (the stemmer is defined over
  * lowercase words); non-alphabetic input passes through unchanged
  * apart from the lowercasing.
  */
case class WordStem(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_word_stem requires a string input, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_word_stem"

  override protected def nullSafeEval(v: Any): Any =
    WordStem.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordStem.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WordStem =
    copy(child = newChild)
}

object WordStem {

  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString.toLowerCase))

  /** Full Porter algorithm: steps 1a–5b over a lowercase word. Words of
    * length ≤ 2 are returned unchanged (too short to have m > 0).
    */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = step1a(word)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    step5b(w)
  }

  // A letter is a consonant when it is not a/e/i/o/u, and 'y' is a
  // consonant only at position 0 or after a vowel (i.e. 'y' preceded by
  // a consonant acts as a vowel: "sky" → C C V is false — s,k consonants,
  // y after consonant is a VOWEL? No: paper — y is a consonant when
  // "toy" (after vowel), a vowel in "syzygy" (after consonant).
  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** The measure m of [C](VC)^m[V]: number of V→C transitions. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1 // skip initial C block
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1 // vowel block
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    (0 until w.length).exists(i => !isCons(w, i))

  /** *d — ends with a double consonant. */
  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o — ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(st) =>
          if (st.endsWith("at") || st.endsWith("bl") || st.endsWith("iz")) st + "e"
          else if (endsDoubleCons(st) && !"lsz".contains(st.charAt(st.length - 1)))
            st.dropRight(1)
          else if (measure(st) == 1 && endsCvc(st)) st + "e"
          else st
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i"
    else w

  // (suffix, replacement) pairs; within a step the FIRST matching
  // suffix is taken and its m-condition tested — on failure the word is
  // left unchanged (no fallback to shorter suffixes), per the paper.
  private val s2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val s3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def replaceLongest(w: String, rules: Seq[(String, String)],
                             minM: Int): String = {
    // longest matching suffix wins (the Seq is scanned longest-first
    // among those that match)
    val matching = rules.filter { case (suf, _) => w.endsWith(suf) }
      .sortBy { case (suf, _) => -suf.length }
    matching.headOption match {
      case Some((suf, rep)) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > minM - 1) stem + rep else w
      case None => w
    }
  }

  private def step2(w: String): String = replaceLongest(w, s2, minM = 1)
  private def step3(w: String): String = replaceLongest(w, s3, minM = 1)

  private val s4: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ion",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou")

  private def step4(w: String): String = {
    val matching = s4.filter(w.endsWith).sortBy(-_.length)
    matching.headOption match {
      case Some(suf) =>
        val stem = w.dropRight(suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || (stem.nonEmpty && "st".contains(stem.charAt(stem.length - 1))))
        if (ok) stem else w
      case None => w
    }
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (measure(w) > 1 && endsDoubleCons(w) && w.endsWith("l")) w.dropRight(1)
    else w
}
