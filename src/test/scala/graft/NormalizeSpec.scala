package graft

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.plans.NativeFunctions

/** graft_normalize vs (a) the reference's own testNormalize vectors
  * (reference presto-main/.../scalar/TestStringFunctions.java:979) and
  * UAX #15 examples, (b) randomized java.text.Normalizer parity through
  * the full DataFrame/codegen path, (c) the SQL-registered surface.
  */
class NormalizeSpec extends SparkSpec {

  // (input, form, expected) — the reference's vectors verbatim plus the
  // UAX #15 reordering/singleton/Hangul cases q169 also pins
  private val vectors: Seq[(String, String, String)] = Seq(
    ("schön", "NFD", "schön"),
    ("schön", "NFC", "schön"),
    ("schön", "NFKD", "schön"),
    ("schön", "NFKC", "schön"),
    ("㈱㌧㌦Ⅲ", "NFKC", "(株)トンドルIII"),
    ("ﾊﾝｶｸｶﾅ", "NFKC", "ハンカクカナ"),
    ("Å", "NFC", "Å"),
    ("q̣̇", "NFC", "q̣̇"),
    ("한글", "NFD", "한글"),
    ("ẛ̣", "NFKC", "ṩ"),
    ("", "NFC", ""),
    ("plain ascii stays put", "NFKD", "plain ascii stays put"))

  test("reference + UAX #15 vectors through the expression") {
    import spark.implicits._
    val rows = vectors.zipWithIndex.map { case ((in, form, exp), i) => (i, in, form, exp) }
      .toDF("i", "in", "form", "exp")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = rows.filter(col("form") === form)
        .select(col("i"), NativeFunctions.normalize(col("in"), form).as("got"), col("exp"))
        .collect()
      got.foreach(r => assert(r.getString(1) == r.getString(2),
        s"vector ${r.getInt(0)} ($form): got ${ascii(r.getString(1))}, want ${ascii(r.getString(2))}"))
    }
  }

  test("randomized parity with java.text.Normalizer on combining-mark soup") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val bases = "aeiounAEIOUNcCsSzZ"
    val marks = (0x300 to 0x30f).map(_.toChar)
    val strs = (1 to 300).map { _ =>
      val sb = new StringBuilder
      (1 to 1 + rnd.nextInt(12)).foreach { _ =>
        sb += bases(rnd.nextInt(bases.length))
        (0 until rnd.nextInt(3)).foreach(_ => sb += marks(rnd.nextInt(marks.length)))
      }
      sb.toString
    }
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val jform = Normalizer.Form.valueOf(form)
      val got = strs.toDF("s")
        .select(col("s"), NativeFunctions.normalize(col("s"), form).as("n"))
        .collect()
      got.foreach(r => assert(r.getString(1) == Normalizer.normalize(r.getString(0), jform),
        s"$form mismatch on ${ascii(r.getString(0))}"))
    }
  }

  test("SQL surface: graft_normalize with default and explicit forms") {
    val r = spark.sql(
      "SELECT graft_normalize('schön') AS d, " +
        "graft_normalize('schön', 'NFD') AS n").collect().head
    assert(r.getString(0) == "schön") // default form is NFC
    assert(r.getString(1) == "schön")
  }

  test("null input yields null; bad form fails at construction") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .select(NativeFunctions.normalize(col("s"), "NFD")).collect().head
    assert(r.isNullAt(0))
    val e = intercept[IllegalArgumentException] {
      NativeFunctions.normalize(lit("x"), "NFX")
    }
    assert(e.getMessage.contains("NFX"))
  }

  private def ascii(s: String): String =
    s.map(c => if (c < 0x80) c.toString else f"\\u${c.toInt}%04x").mkString
}
