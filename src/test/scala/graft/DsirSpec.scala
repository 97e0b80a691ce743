package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance selection (q175 / graft.operators.Dsir). */
class DsirSpec extends SparkSpec {

  // target = docs built from the "target" vocabulary; raw mixes in a
  // disjoint "noise" vocabulary — importance scoring must rank
  // target-looking raw docs above noise-looking ones
  private def corpus = {
    import spark.implicits._
    val target = (1L to 40L).map(i =>
      (i, "alpha beta gamma delta alpha beta gamma delta", true))
    val lookalike = (101L to 110L).map(i =>
      (i, "alpha beta gamma delta epsilon", false))
    val noise = (201L to 210L).map(i =>
      (i, "zeta eta theta iota kappa lambda", false))
    (target ++ lookalike ++ noise).toDF("doc_id", "text", "is_t")
  }

  test("target-vocabulary docs outscore disjoint-vocabulary docs") {
    val top = Dsir.importanceTopK(corpus, col("is_t"), b = 256, k = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val look = (101L to 110L).map(top)
    val noise = (201L to 210L).map(top)
    assert(look.min > noise.max,
      s"lookalike scores $look should all exceed noise scores $noise")
  }

  test("top-k honors k and ranks by score with doc_id tie-break") {
    val out = Dsir.importanceTopK(corpus, col("is_t"), b = 256, k = 5).collect()
    assert(out.length == 5)
    val scores = out.map(_.getLong(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("scores are partition-invariant (exact int64 arithmetic)") {
    def run(parts: Int) =
      Dsir.importanceTopK(corpus.repartition(parts), col("is_t"), b = 256, k = 60)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("ratio table is bucket-sized and carries integer micro-units") {
    val rt = Dsir.ratioTable(corpus, col("is_t"), b = 256)
    assert(rt.count() <= 256)
    // a bucket hit only by noise words must carry a negative ratio
    // (p_target below p_raw); one hit mostly by target words, positive
    val byBucket = rt.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(byBucket.exists(_._2 > 0) && byBucket.exists(_._2 < 0))
  }

  test("fit/score split == self-contained composition (deployment face)") {
    // the ANN fit/search discipline: fit ratios once, persist, score a
    // corpus against the loaded table — must equal importanceTopK when
    // the fit corpus IS the scored corpus
    val ratios = Dsir.ratioTable(corpus, col("is_t"), b = 256)
    val split = Dsir.scoreAgainst(corpus, ratios, b = 256, k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val inline = Dsir.importanceTopK(corpus, col("is_t"), b = 256, k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(split == inline)
  }

  test("scoring a ratio table fitted elsewhere ranks by target likeness") {
    import spark.implicits._
    val ratios = Dsir.ratioTable(corpus, col("is_t"), b = 256)
    val fresh = Seq(
      (301L, "alpha beta gamma delta"), // target-vocabulary
      (302L, "zeta eta theta iota")     // noise-vocabulary
    ).toDF("doc_id", "text")
    val scores = Dsir.scoreAgainst(fresh, ratios, b = 256, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(301L) > scores(302L))
  }

  test("empty and sub-1-word docs produce no occurrences and are never selected") {
    import spark.implicits._
    val withEmpty = corpus.unionByName(
      Seq((900L, "", false), (901L, "   ", false)).toDF("doc_id", "text", "is_t"))
    val ids = Dsir.importanceTopK(withEmpty, col("is_t"), b = 256, k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(900L) && !ids.contains(901L))
    assert(ids.contains(1L))
  }
}
