package graft

import org.apache.spark.sql.functions._

import graft.plans.{HdrQuantileAgg, NativeFunctions}

/** The mergeable HDR-histogram quantile sketch: partition invariance
  * (merge correctness), the ≤ 6.25% relative-error design bound, and the
  * SQL function registration.
  */
class HdrQuantileSpec extends SparkSpec {

  private def cents = Tables.lineitem(spark, sfDir)
    .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))

  test("estimate is invariant under repartitioning (merge = elementwise add)") {
    val one = cents.repartition(1)
      .agg(NativeFunctions.hdrQuantile(col("c"), 0.5)).head.getDouble(0)
    val many = cents.repartition(17)
      .agg(NativeFunctions.hdrQuantile(col("c"), 0.5)).head.getDouble(0)
    assert(one === many)
  }

  test("p50/p90 stay within the 6.25% relative-error bound of exact") {
    for (q <- Seq(0.5, 0.9)) {
      val est = cents.agg(NativeFunctions.hdrQuantile(col("c"), q)).head.getDouble(0)
      val exact = cents.agg(expr(s"percentile(c, cast($q as double))")).head.getDouble(0)
      assert(math.abs(est - exact) / exact <= 0.0625,
        s"q=$q: estimate $est vs exact $exact")
    }
  }

  test("registered as SQL function graft_hdr_quantile") {
    cents.createOrReplaceTempView("hdr_cents")
    val viaSql = spark.sql(
      "SELECT graft_hdr_quantile(c, 0.5) FROM hdr_cents").head.getDouble(0)
    val viaCol = cents.agg(NativeFunctions.hdrQuantile(col("c"), 0.5)).head.getDouble(0)
    assert(viaSql === viaCol)
  }

  test("bucket/midpoint roundtrip keeps relative error under 6.25%") {
    for (c <- Seq(1L, 7L, 8L, 15L, 16L, 100L, 12345L, 999999L, 1L << 40)) {
      val mid = HdrQuantileAgg.midpoint(HdrQuantileAgg.bucketOf(c))
      assert(math.abs(mid - c) / c.toDouble <= 0.0625, s"c=$c mid=$mid")
    }
  }

  test("empty group evaluates to null") {
    val r = cents.filter(col("c") < 0)
      .agg(NativeFunctions.hdrQuantile(col("c"), 0.5)).head
    assert(r.isNullAt(0))
  }

  test("values_at_quantiles agrees with per-quantile calls, in one walk") {
    val multi = cents.agg(NativeFunctions.hdrQuantiles(col("c"), Seq(0.25, 0.5, 0.9)))
      .head.getSeq[Double](0)
    val singles = Seq(0.25, 0.5, 0.9).map(q =>
      cents.agg(NativeFunctions.hdrQuantile(col("c"), q)).head.getDouble(0))
    assert(multi === singles)
  }

  test("quantile_at_value inverts value_at_quantile at bucket resolution") {
    val p50 = cents.agg(NativeFunctions.hdrQuantile(col("c"), 0.5)).head.getDouble(0)
    val rank = cents.agg(NativeFunctions.hdrRank(col("c"), p50.toLong)).head.getDouble(0)
    // rank of the p50 value must cover the 50th percentile, and not
    // overshoot by more than one bucket's mass
    assert(rank >= 0.5 - 1e-9 && rank <= 0.75, s"rank=$rank")
  }

  test("resolution knob: bits=6 stays within 0.78% and beats bits=3's error") {
    import spark.implicits._
    // log-spread values stress the relative-error bound at every scale
    val raw = (0 until 4000).map(i => math.round(math.exp(i / 250.0) * 100))
    val vals = raw.toDF("c")
    val sorted = raw.sorted
    for (q <- Seq(0.25, 0.5, 0.9)) {
      // the sketch estimates the rank statistic at ceil(q·n) — compare
      // against exactly that (interpolated percentile() can fall outside
      // the rank value's bucket and inflate the apparent error)
      val exact = sorted(math.max(1, math.ceil(q * sorted.length).toInt) - 1).toDouble
      val e3 = math.abs(vals.agg(NativeFunctions.hdrQuantile(col("c"), q, bits = 3))
        .head.getDouble(0) - exact) / exact
      val e6 = math.abs(vals.agg(NativeFunctions.hdrQuantile(col("c"), q, bits = 6))
        .head.getDouble(0) - exact) / exact
      assert(e6 <= 0.0078125, s"q=$q: 6-bit error $e6")
      assert(e3 <= 0.0625, s"q=$q: 3-bit error $e3")
      assert(e6 <= e3, s"q=$q: higher resolution must not be worse ($e6 vs $e3)")
    }
  }

  test("weighted insert equals physically replicated rows; scaling weights is a no-op") {
    import spark.implicits._
    val weighted = Seq((100L, 3L), (200L, 1L), (50L, 6L)).toDF("c", "w")
    val replicated = weighted
      .select(col("c"), explode(expr("sequence(1, w)"))).select("c")
    val a = weighted.agg(
      NativeFunctions.hdrWeightedQuantile(col("c"), col("w"), 0.5)).head.getDouble(0)
    val b = replicated.agg(
      NativeFunctions.hdrQuantile(col("c"), 0.5)).head.getDouble(0)
    assert(a === b)
    // scale_qdigest: uniform weight scaling leaves every quantile fixed
    val scaled = weighted.agg(NativeFunctions.hdrWeightedQuantile(
      col("c"), col("w") * 1000L, 0.5)).head.getDouble(0)
    assert(scaled === a)
  }

  test("graft_hdr_quantile accepts the bits argument in SQL; _w registered") {
    cents.createOrReplaceTempView("hdr_cents3")
    val hi = spark.sql(
      "SELECT graft_hdr_quantile(c, 0.5, 6) FROM hdr_cents3").head.getDouble(0)
    val viaCol = cents.agg(
      NativeFunctions.hdrQuantile(col("c"), 0.5, bits = 6)).head.getDouble(0)
    assert(hi === viaCol)
    val w = spark.sql(
      "SELECT graft_hdr_quantile_w(c, 2L, 0.5, 6) FROM hdr_cents3").head.getDouble(0)
    assert(w === hi) // uniform weight changes nothing
  }

  test("graft_hdr_quantiles / graft_hdr_rank registered as SQL functions") {
    cents.createOrReplaceTempView("hdr_cents2")
    val arr = spark.sql(
      "SELECT graft_hdr_quantiles(c, 0.25, 0.5) FROM hdr_cents2").head.getSeq[Double](0)
    assert(arr.length === 2 && arr(0) <= arr(1))
    val rk = spark.sql(
      "SELECT graft_hdr_rank(c, 2000000) FROM hdr_cents2").head.getDouble(0)
    assert(rk > 0.0 && rk <= 1.0)
  }
}
