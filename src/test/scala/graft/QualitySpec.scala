package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Report}

/** Quality.score's zero-word / degenerate-document contract (the r13
  * advisor finding): no real document may yield NULL ratios or a NULL
  * quality, because a NULL silently desynchronizes Report's
  * sum(quality) from its n_docs and rides keepBest's ordering by
  * nulls-last accident. The full score arithmetic is oracled by q67;
  * this pins the degenerate edge.
  */
class QualitySpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq((1L, "the cat sat on the mat"),
      (2L, ""), // empty text
      (3L, "   "), // whitespace only
      (4L, "x")) // single short word
      .toDF("doc_id", "text")
  }

  test("no document yields NULL quality or NULL ratios") {
    val scored = Quality.score(corpus)
    val nulls = scored.filter(col("quality").isNull || col("avg_wlen").isNull ||
      col("stop_ratio").isNull || col("short_ratio").isNull).count()
    assert(nulls == 0L, "NULL quality/ratio leaked from a degenerate document")
  }

  test("quality stays inside [0, 1] on degenerate documents") {
    val bad = Quality.score(corpus)
      .filter(col("quality") < 0.0 || col("quality") > 1.0).count()
    assert(bad == 0L)
  }

  test("report denominators agree: every scored doc contributes to avg_quality") {
    // n_docs counts documents; with the zero-word guard sum(quality)
    // sums over the SAME set (no NULL-skipped rows)
    val docs = corpus.withColumn("source", lit("s"))
      .withColumn("lang", lit("en"))
    val card = Report.card(Report.thin(docs))
    val r = card.filter(col("source") === "s").head()
    assert(r.getAs[Long]("n_docs") == 4L, r.toString)
    assert(!r.isNullAt(r.fieldIndex("avg_quality")), "avg_quality is NULL")
  }
}
