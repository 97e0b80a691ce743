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
