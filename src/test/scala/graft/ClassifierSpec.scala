package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Hand-computed correctness for the classifier quality gate (q207):
  * integer odds weights, minDf cut, integer weighted-mean scores, and
  * the frozen-weights deployment face.
  */
class ClassifierSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "good solid prose here", "wiki"),
      (2L, "good good spam", "web"),
      (3L, "solid spam spam", "web")
    ).toDF("doc_id", "text", "source")
  }

  test("fitOdds: ppm odds per word, rare words cut at minDf") {
    val w = Classifier.fitOdds(docs, col("source") === "wiki", minDf = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // good: 1 pos / 3 total; solid: 1/2; spam: 0/3; prose+here dropped
    assert(w == Map(
      "good" -> ((1L, 3L, 333333L)),
      "solid" -> ((1L, 2L, 500000L)),
      "spam" -> ((0L, 3L, 0L))), w)
  }

  test("trainScore: integer weighted mean over in-vocabulary words only") {
    val s = Classifier.trainScore(docs, col("source") === "wiki")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: (333333 + 500000) div 2 — prose/here are out-of-vocab
    assert(s == Set((1L, 2L, 416666L), (2L, 3L, 222222L), (3L, 3L, 166666L)), s)
  }

  test("scoreAgainst deploys frozen weights: per-batch scores == whole-corpus scores") {
    val weights = Classifier.fitOdds(docs, col("source") === "wiki")
      .localCheckpoint()
    val whole = Classifier.scoreAgainst(docs, weights)
      .collect().map(_.toSeq).toSet
    // scoring is per-document map-side work against fixed weights, so
    // any batch split unions to the whole — the streaming posture
    val parts = Seq(docs.filter(col("doc_id") < 3), docs.filter(col("doc_id") >= 3))
      .map(b => Classifier.scoreAgainst(b, weights).collect().map(_.toSeq).toSet)
      .reduce(_ ++ _)
    assert(parts == whole, s"$parts != $whole")
  }
}
