package graft

import org.apache.spark.sql.functions._

import graft.queries.AggregateQueries

/** Accuracy bounds for the estimate-valued aggregates that the DuckDB
  * oracle can't check (no HLL state on the oracle side).
  */
class SketchAccuracySpec extends SparkSpec {

  test("hll sketch union estimate stays within 5% of the exact rollup") {
    val est = AggregateQueries.q57.fn(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (region, n) =>
      val e = est(region)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"region $region: estimate $e vs exact $n")
    }
  }
}
