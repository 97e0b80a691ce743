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

  test("fitOdds: a NULL seed-predicate result counts as negative (stated contract)") {
    import spark.implicits._
    // doc 3's source is NULL → source === "wiki" evaluates NULL → the
    // doc's words must land in cnt_all but never cnt_pos
    val d = Seq(
      (1L, "term term", Some("wiki")),
      (2L, "term", Some("web")),
      (3L, "term", None: Option[String])
    ).toDF("doc_id", "text", "source")
    val w = Classifier.fitOdds(d, col("source") === "wiki", minDf = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(w("term") == ((2L, 4L)), w)
  }

  test("withDeciles: rank deciles spread ties consistently, exact integer cuts") {
    import spark.implicits._
    // 10 docs, scores 100..1000 in steps of 100 with one tie at 500
    val scores = Seq(
      (1L, 5L, 100L), (2L, 5L, 200L), (3L, 5L, 300L), (4L, 5L, 400L),
      (5L, 5L, 500L), (6L, 5L, 500L), (7L, 5L, 700L), (8L, 5L, 800L),
      (9L, 5L, 900L), (10L, 5L, 1000L)).toDF("doc_id", "n_scored", "score_ppm")
    val out = Classifier.withDeciles(scores).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // decile = docs-strictly-below * 10 div 10; the 500-tie shares decile 4
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 4L, 6L -> 4L, 7L -> 6L, 8L -> 7L, 9L -> 8L, 10L -> 9L), out)
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

  private def langDocs = {
    import spark.implicits._
    Seq(
      (1L, "bonjour monde bonjour", Some("fr")),
      (2L, "hello world", Some("en")),
      (3L, "bonjour world", Some("fr")),
      (4L, "hello hello world", Some("en")),
      (5L, "mundo hola", None: Option[String]) // unlabeled: not training
    ).toDF("doc_id", "text", "lang")
  }

  test("fitOddsMulti: dense grid with explicit zero cells; NULL labels excluded") {
    val w = Classifier.fitOddsMulti(langDocs, col("lang"), minDf = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // vocab after minDf=2: bonjour(3 fr), hello(3 en), world(2 en + 1 fr);
    // monde (1) cut; doc 5's words never trained (NULL label)
    assert(w == Map(
      ("bonjour", "en") -> 0L, ("bonjour", "fr") -> 1000000L,
      ("hello", "en") -> 1000000L, ("hello", "fr") -> 0L,
      ("world", "en") -> 666666L, ("world", "fr") -> 333333L), w)
  }

  test("classifyAgainst: per-label integer means, argmax, shared denominators") {
    val out = Classifier.trainClassify(langDocs, col("lang"), minDf = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1: fr (2*1e6) div 2 = 1e6 beats en 0; doc 2: en 833333 beats
    // fr 166666; doc 3: fr 666666 beats en 333333; doc 4: en 888888;
    // doc 5: no in-vocab words -> ABSENT (no evidence, stated contract)
    assert(out == Map(
      1L -> (("fr", 1000000L, 2L)), 2L -> (("en", 833333L, 2L)),
      3L -> (("fr", 666666L, 2L)), 4L -> (("en", 888888L, 3L))), out)
  }

  test("classifyAgainst: exact score tie breaks to the first label") {
    import spark.implicits._
    val weights = Classifier.fitOddsMulti(langDocs, col("lang"), minDf = 2)
      .localCheckpoint()
    // "bonjour hello": en (0 + 1e6) div 2 == fr (1e6 + 0) div 2 -> tie
    // -> label asc -> en
    val tied = Seq((9L, "bonjour hello")).toDF("doc_id", "text")
    val r = Classifier.classifyAgainst(tied, weights).collect()
    assert(r.length == 1 && r.head.getString(1) == "en" &&
      r.head.getLong(2) == 500000L, r.mkString(";"))
  }
}
