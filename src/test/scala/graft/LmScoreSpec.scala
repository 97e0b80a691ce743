package graft

import org.apache.spark.sql.functions._

import graft.operators.LmScore

/** Laws of the corpus-statistical LM quality filter
  * (operators/LmScore.scala):
  *  - fluent (in-vocabulary) docs outscore gibberish;
  *  - the score matches a serial recomputation exactly (all-integer
  *    arithmetic — no tolerance needed);
  *  - OOV fraction is exact.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("gibberish scores below fluent text; oov_frac exact") {
    val fluent = (1L to 50L).map(i => (i, "the cat sat on the mat and the dog ran"))
    val gibberish = Seq((99L, "zqx vbn wpl kjh zqx mno qrs tuv wxy zab"))
    val df = LmScore.score((fluent ++ gibberish).toDF("doc_id", "text"), v = 8, threshold = -5.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logp"), r.getAs[Double]("oov_frac"), r.getAs[Boolean]("keep"))).toMap
    val (fluentScore, fluentOov, fluentKeep) = df(1L)
    val (gibScore, gibOov, _) = df(99L)
    assert(fluentScore > gibScore, s"fluent $fluentScore !> gibberish $gibScore")
    assert(fluentOov == 0.0 && fluentKeep, "fluent doc should be fully in-vocab and kept")
    // gibberish: 10 tokens, every distinct token appears once; the 8-term
    // model is dominated by the 50x-repeated fluent vocabulary
    assert(gibOov > 0.8, s"gibberish should be mostly OOV: $gibOov")
  }

  test("zero-token docs appear in the output with keep=false, null scores") {
    val df = LmScore.score(
        Seq((1L, "a a b"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"),
        v = 2, threshold = -2.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(df.keySet == Set(1L, 2L, 3L), "empty docs must not be dropped")
    for (id <- Seq(2L, 3L)) {
      val r = df(id)
      assert(r.getAs[Long]("n_tokens") == 0L, s"doc $id n_tokens")
      assert(r.isNullAt(r.fieldIndex("oov_frac")), s"doc $id oov_frac should be null")
      assert(r.isNullAt(r.fieldIndex("avg_logp")), s"doc $id avg_logp should be null")
      assert(!r.getAs[Boolean]("keep"), s"doc $id must be keep=false")
    }
    assert(df(1L).getAs[Boolean]("keep"), "non-empty in-vocab doc still kept")
  }

  test("score equals the serial all-integer recomputation") {
    val corpus = Seq((1L, "a a a b b c"), (2L, "a b x"), (3L, "c c a"))
    val v = 2 // model = {a (5), b (3)}; c and x are OOV
    val got = LmScore.score(corpus.toDF("doc_id", "text"), v = v, threshold = -2.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("oov_frac"), r.getAs[Double]("avg_logp"))).toMap
    // serial: N = 12 tokens, denom = N + v + 1 = 15
    val counts = Map("a" -> 5L, "b" -> 3L)
    def lnpMicro(c: Long) = math.floor(math.log((c + 1).toDouble / 15.0) * 1e6).toLong
    val oovMicro = lnpMicro(0)
    for ((id, text) <- corpus) {
      val toks = text.split(" ").toSeq
      val n = toks.size.toLong
      val sumMicro = toks.groupBy(identity).map { case (t, ts) =>
        ts.size.toLong * counts.get(t).map(lnpMicro).getOrElse(oovMicro)
      }.sum
      val oovToks = toks.count(t => !counts.contains(t)).toLong
      val expOov = ((2 * oovToks * 1000000 + n) / (2 * n)).toDouble / 1e6
      val expAvg = -(((2 * -sumMicro + n) / (2 * n)).toDouble) / 1e6
      val (gn, goov, gavg) = got(id)
      assert(gn == n && goov == expOov && gavg == expAvg,
        s"doc $id: got ($gn,$goov,$gavg) want ($n,$expOov,$expAvg)")
    }
  }
}
