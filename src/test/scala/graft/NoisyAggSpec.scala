package graft

import org.apache.spark.sql.functions._

import graft.queries.AggregateQueries

/** The q148 seeded-noise machinery must actually BE approximately
  * Gaussian with the stated scale — determinism alone (the oracle's
  * job) doesn't prove the noise is fit for the reference's
  * noisy_*_gaussian contract (aggregate.rst: "random Gaussian noise
  * with 0 mean and standard deviation of noise_scale").
  */
class NoisyAggSpec extends SparkSpec {

  private val scaleUnits = 1000L

  private lazy val samples: Array[Long] = {
    import spark.implicits._
    (1L to 4000L).map(i => s"g$i").toDF("grp")
      .select(expr(AggregateQueries.q148NoiseSpark("grp", 42, scaleUnits, "spec"))
        .cast("long").as("noise"))
      .as[Long].collect()
  }

  test("noise is centered: |mean| well under sd/sqrt(n)·3") {
    val mean = samples.map(_.toDouble).sum / samples.length
    assert(math.abs(mean) < 3.0 * scaleUnits / math.sqrt(samples.length.toDouble),
      s"mean=$mean")
  }

  test("noise sd matches the declared scale within 5%") {
    val mean = samples.map(_.toDouble).sum / samples.length
    val sd = math.sqrt(samples.map(x => math.pow(x - mean, 2)).sum / (samples.length - 1))
    assert(math.abs(sd - scaleUnits) / scaleUnits < 0.05, s"sd=$sd vs $scaleUnits")
  }

  test("tail mass is Gaussian-like, not uniform") {
    // P(|X| > 2sd) ≈ 4.6% for a Gaussian (Irwin–Hall(12) is slightly
    // lighter-tailed); uniform noise of the same sd would put ~42%
    // outside 1sd and 0% outside 2sd only at hard cutoff ±sqrt(3)sd
    val beyond1 = samples.count(x => math.abs(x) > scaleUnits).toDouble / samples.length
    val beyond2 = samples.count(x => math.abs(x) > 2 * scaleUnits).toDouble / samples.length
    assert(beyond1 > 0.25 && beyond1 < 0.38, s"P(|X|>sd)=$beyond1 (Gaussian ≈ 0.317)")
    assert(beyond2 > 0.02 && beyond2 < 0.07, s"P(|X|>2sd)=$beyond2 (Gaussian ≈ 0.046)")
  }

  test("deterministic: same seed+group → same draw, different seed → different") {
    import spark.implicits._
    val df = Seq("a", "b").toDF("grp")
    def draws(seed: Int): Map[String, Long] = df
      .select(col("grp"),
        expr(AggregateQueries.q148NoiseSpark("grp", seed, scaleUnits, "spec"))
          .cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(draws(42) == draws(42))
    assert(draws(42) != draws(43))
  }
}
