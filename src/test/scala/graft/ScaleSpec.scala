package graft

import org.apache.spark.sql.functions._

/** Scale-up smoke: the same plans over 32× the rows (≈2M lineitem)
  * must still complete with the partitioning/broadcast posture intact,
  * and exact-decimal aggregates must scale EXACTLY linearly — the
  * correctness invariant that survives any re-partitioning.
  */
class ScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("decimal aggregate over 32x replicated lineitem is exactly 32x the base") {
    val li = Tables.lineitem(spark, dir)
    val big = (1 to 32).map(_ => li).reduce(_ unionAll _).repartition(32)
    val base = li.agg(sum(Q.dec(col("l_extendedprice")))).head.getDecimal(0)
    val scaled = big.agg(sum(Q.dec(col("l_extendedprice")))).head.getDecimal(0)
    assert(scaled.compareTo(base.multiply(new java.math.BigDecimal(32))) == 0)
    assert(big.count() === li.count() * 32)
  }

  test("fact-dim join over replicated fact fans out exactly and stays broadcast") {
    val li = Tables.lineitem(spark, dir)
    val big = (1 to 8).map(_ => li).reduce(_ unionAll _)
    val joined = big.join(broadcast(Tables.orders(spark, dir)),
      col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() === li.count() * 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
