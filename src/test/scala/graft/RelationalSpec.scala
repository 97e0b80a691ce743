package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries

/** Sanity checks on the relational core (the DuckDB oracle via Verify is
  * the full gate; these are fast structural invariants).
  */
class RelationalSpec extends SparkSpec {

  test("q02 TPC-H Q1 groups all flag/status combinations") {
    val rows = RelationalQueries.q02.fn(spark, sfDir).collect()
    assert(rows.length == 6) // 3 returnflags × 2 linestatus
    assert(rows.map(_.getAs[Long]("count_order")).sum ==
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp")).count())
  }

  test("q03 top-N returns at most 10 ordered by revenue desc") {
    val rows = RelationalQueries.q03.fn(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("set ops: intersect ∪ except partitions the left side") {
    val building = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val inter = RelationalQueries.q15.fn(spark, sfDir).count()
    val except = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
      .except(Tables.orders(spark, sfDir).filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("custkey"))).count()
    assert(inter + except == building.count())
  }

  test("semi + anti join partition orders by lineitem-discount predicate") {
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir).filter(col("l_discount") > 0.05)
    val semi = orders.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    val anti = orders.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(semi + anti == orders.count())
  }
}
