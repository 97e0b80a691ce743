package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.queries.AggregateQueries

/** Accuracy + mergeability bounds for the sketch aggregates. The
  * SQL-replayable graft HLL (q49/q57) is hash-checked by the oracle; here
  * we bound its statistical error and prove the merge identity. Spark's
  * Datasketches-backed HLL path (not oracle-able) gets its own bound.
  */
class SketchAccuracySpec extends SparkSpec {

  private def exactByRegion: Map[Int, Long] =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("datasketches hll union estimate stays within 5% of the exact rollup") {
    val est = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"), col("n_nationkey"))
      .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      .groupBy(col("n_regionkey"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .cast("bigint").as("approx_customers"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = exactByRegion
    assert(est.keySet === exact.keySet)
    exact.foreach { case (region, n) =>
      val e = est(region)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"region $region: estimate $e vs exact $n")
    }
  }

  test("replayable graft HLL (p=8, q49) stays within 3 sigma = 20%") {
    val rows = AggregateQueries.q49.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= exact * 0.20,
        s"flag ${r.get(0)}: estimate $est vs exact $exact")
    }
  }

  test("replayable graft HLL merge (p=6, q57) within 3 sigma = 40%") {
    val est = AggregateQueries.q57.fn(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = exactByRegion
    assert(est.keySet === exact.keySet)
    exact.foreach { case (region, n) =>
      assert(math.abs(est(region) - n) <= n * 0.40,
        s"region $region: estimate ${est(region)} vs exact $n")
    }
  }

  test("percentile_approx tracks exact percentile within 2% of the value") {
    val li = Tables.lineitem(spark, sfDir)
    for (q <- Seq(0.5, 0.9)) {
      val row = li.agg(
        expr(s"percentile_approx(l_extendedprice, cast($q as double), 10000)").as("approx"),
        expr(s"percentile(l_extendedprice, cast($q as double))").as("exact")).head
      val (approx, exact) = (row.getDouble(0), row.getDouble(1))
      assert(math.abs(approx - exact) / exact <= 0.02,
        s"q=$q: approx $approx vs exact $exact")
    }
  }

  test("HLL merge identity: per-nation registers max-merged == direct region registers") {
    val p = 6
    val joined = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey"), col("n_nationkey"),
        Sketches.hllHash("c_custkey").as("h"))
      .select(col("n_regionkey"), col("n_nationkey"),
        expr(s"h % ${1 << p}").as("bucket"), expr(s"h div ${1 << p}").as("w"))
      .select(col("n_regionkey"), col("n_nationkey"), col("bucket"),
        Sketches.hllRho("w", p).as("rho"))
    val viaMerge = joined
      .groupBy(col("n_regionkey"), col("n_nationkey"), col("bucket"))
      .agg(max("rho").as("r"))
      .groupBy(col("n_regionkey"), col("bucket")).agg(max("r").as("r"))
    val direct = joined
      .groupBy(col("n_regionkey"), col("bucket")).agg(max("rho").as("r"))
    assert(viaMerge.exceptAll(direct).isEmpty && direct.exceptAll(viaMerge).isEmpty)
  }
}
