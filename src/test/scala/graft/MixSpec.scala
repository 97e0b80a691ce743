package graft

import org.apache.spark.sql.functions._
import graft.operators.Mix

/** Temperature-scaled mixing (Mix.availabilityTemperature /
  * keepTemperature) — the UniMax / α-sampling recipe. Fixed-share
  * mixing is oracled by q152/q190; these pin the temperature math.
  */
class MixSpec extends SparkSpec {

  // (doc_id, lang, text) with exact whitespace token counts: lang "a"
  // has 100 tokens across 2 docs, lang "b" 400 across 4 — a 1:4
  // availability ratio whose sqrt is exact (10 vs 20)
  private def corpus = {
    import spark.implicits._
    val mk = (n: Int) => (1 to n).map(i => s"t$i").mkString(" ")
    (Seq((1L, "a", mk(40)), (2L, "a", mk(60))) ++
      (0 until 4).map(i => (10L + i, "b", mk(100))))
      .toDF("doc_id", "lang", "text")
  }

  test("alpha=0.5 shares are the hand-computed exact integers") {
    val av = Mix.availabilityTemperature(Mix.counted(corpus), 300L)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("avail"), r.getAs[Long]("share_ppm"), r.getAs[Long]("want"))).toMap
    // w_a = floor(sqrt(100)*1e6) = 1e7, w_b = 2e7, wsum = 3e7
    // share_a = 1e7*1e5 div 3e7 = 33333; share_b = 66666
    // want_a = 300*33333 div 1e5 = 99; want_b = 300*66666 div 1e5 = 199
    assert(av("a") == (100L, 33333L, 99L), av("a").toString)
    assert(av("b") == (400L, 66666L, 199L), av("b").toString)
  }

  test("alpha=1 degrades to proportional sampling; alpha=0.5 boosts the low-resource language") {
    val cnt = Mix.counted(corpus)
    val prop = Mix.availabilityTemperature(cnt, 300L, alpha = 1.0)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("share_ppm")).toMap
    // proportional: a = 100*1e5 div 500 = 20000, b = 80000
    assert(prop("a") == 20000L && prop("b") == 80000L, prop.toString)
    val temp = Mix.availabilityTemperature(cnt, 300L, alpha = 0.5)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("share_ppm")).toMap
    assert(temp("a") > prop("a"), s"low-resource not boosted: $temp vs $prop")
    assert(temp("b") < prop("b"), s"high-resource not damped: $temp vs $prop")
  }

  test("general alpha rides the dyadic sqrt-chain, pinned against the JVM replay") {
    // the contract: w = floor(chain(avail) * 1e6) with chain the nested-
    // sqrt product — replayed here with scalar math.sqrt in the same
    // canonical order (shallowest factor first, left-assoc multiply)
    def chain(x: Double, alpha: Double): Double = {
      val k = math.round(alpha * (1 << 20)).toInt
      (0 until 20).filter(j => ((k >> j) & 1) == 1).map(20 - _).sorted
        .map(d => (1 to d).foldLeft(x)((c, _) => math.sqrt(c)))
        .reduceLeft(_ * _)
    }
    for (alpha <- Seq(0.25, 0.3, 0.7)) {
      val got = Mix.availabilityTemperature(Mix.counted(corpus), 300L, alpha)
        .collect().map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("avail"), r.getAs[Long]("share_ppm"))).toMap
      val w = Map("a" -> math.floor(chain(100.0, alpha) * 1e6).toLong,
        "b" -> math.floor(chain(400.0, alpha) * 1e6).toLong)
      val wsum = w.values.sum
      for ((lang, (_, ppm)) <- got)
        assert(ppm == w(lang) * 100000L / wsum, s"alpha=$alpha $lang: $ppm")
      assert(got.values.map(_._2).sum <= 100000L)
    }
  }

  test("the chain tracks real pow to ~1ulp and the snapped alpha to 2^-20") {
    // sanity on the snap contract: chain(x, k(alpha)) is within a few
    // ulp of x^(k/2^20), and k/2^20 is within 2^-21 of alpha
    for (alpha <- Seq(0.3, 0.7); x <- Seq(100.0, 400.0, 1e9, 123456789.0)) {
      val k = Mix.dyadicK(alpha)
      assert(math.abs(k.toDouble / (1 << 20) - alpha) <= math.pow(2, -21))
      val sparkSide = spark.range(1).select(
        Mix.dyadicPow(lit(x), k)).head.getDouble(0)
      val exact = math.pow(x, k.toDouble / (1 << 20))
      assert(math.abs(sparkSide / exact - 1.0) < 1e-13,
        s"alpha=$alpha x=$x chain=$sparkSide pow=$exact")
    }
  }

  test("boost direction is monotone in alpha: cooler sampling boosts low-resource more") {
    val cnt = Mix.counted(corpus)
    def ppm(alpha: Double) = Mix.availabilityTemperature(cnt, 300L, alpha)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("share_ppm")).toMap
    val (a03, a05, a07, a10) = (ppm(0.3), ppm(0.5), ppm(0.7), ppm(1.0))
    assert(a03("a") > a05("a") && a05("a") > a07("a") && a07("a") > a10("a"),
      s"low-resource shares not monotone: ${Seq(a03, a05, a07, a10).map(_("a"))}")
    assert(a03("b") < a07("b") && a07("b") < a10("b"),
      s"high-resource shares not monotone: ${Seq(a03, a07, a10).map(_("b"))}")
  }

  test("alpha=1 shares stay exact at corpus sizes where int64 ppm math would wrap") {
    import spark.implicits._
    // avail 3e9 vs 1e9 tokens: w = avail*1e6 at alpha=1, so the int64
    // form's w*1e5 ~ 3e20 wraps negative and silently drops the
    // language; the widened form must return exactly 75000 / 25000
    val cnt = Seq((1L, "big", 3000000000L, 7L), (2L, "small", 1000000000L, 9L))
      .toDF("doc_id", "lang", "toks", "h")
    val got = Mix.availabilityTemperature(cnt, budgetTokens = 1000000L, alpha = 1.0)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("share_ppm"), r.getAs[Long]("want"))).toMap
    assert(got("big") == (75000L, 750000L), got.toString)
    assert(got("small") == (25000L, 250000L), got.toString)
  }

  test("wsum itself is widened: shares stay exact where a long SUM of w would wrap") {
    import spark.implicits._
    // three languages at 4e12 tokens each: w = 4e18 at alpha=1, so
    // wsum = 1.2e19 > Long.MaxValue (9.22e18) — a plain long sum wraps
    // negative and every share goes wrong; the widened sum returns the
    // exact 33333 ppm each
    val cnt = Seq((1L, "x", 4000000000000L, 1L), (2L, "y", 4000000000000L, 2L),
      (3L, "z", 4000000000000L, 3L)).toDF("doc_id", "lang", "toks", "h")
    val got = Mix.availabilityTemperature(cnt, budgetTokens = 300000L, alpha = 1.0)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("share_ppm")).toMap
    assert(got == Map("x" -> 33333L, "y" -> 33333L, "z" -> 33333L), got.toString)
  }

  test("a boosted language past its availability caps at rate 1 (keeps everything)") {
    import spark.implicits._
    // lang "tiny" holds 4 tokens vs 10000 for "big": alpha=0.5 gives
    // tiny share_ppm = 2e6*1e5 div 1.02e8 = 1960 -> want = 98 > avail 4
    val skew = (Seq((1L, "tiny", "w1 w2 w3 w4")) ++
      (0 until 100).map(i => (10L + i, "big", (1 to 100).map(j => s"x$j").mkString(" "))))
      .toDF("doc_id", "lang", "text")
    val kept = Mix.keepTemperature(skew, budgetTokens = 5000L)
    assert(kept.filter(col("lang") === "tiny").count() == 1L,
      "capped language must keep all its documents")
    // and the budget still binds the big language below availability
    val bigKept = kept.filter(col("lang") === "big")
      .agg(sum(col("toks"))).head.getLong(0)
    assert(bigKept < 10000L, s"big language kept $bigKept of 10000")
  }

  test("keepTemperature equals the manual availability-join filter") {
    val cnt = Mix.counted(corpus)
    val av = Mix.availabilityTemperature(cnt, 300L)
    val manual = cnt.join(av.drop("share_ppm"), "lang")
      .where(col("want") >= col("avail") ||
        col("h") < expr("1152921504606846976L div avail") * col("want"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Mix.keepTemperature(corpus, 300L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == manual)
  }

  test("alpha outside (0, 1] fails loudly") {
    intercept[IllegalArgumentException] {
      Mix.availabilityTemperature(Mix.counted(corpus), 300L, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Mix.keepTemperature(corpus, 300L, alpha = 1.5)
    }
  }
}
