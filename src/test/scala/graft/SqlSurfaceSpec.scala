package graft

import org.apache.spark.sql.functions._

/** A reference user ports SQL text, not DataFrame programs: the same
  * queries must run as literal SQL through spark.sql() — including the
  * graft extension functions — and match the DataFrame formulations.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def registerTables(): Unit =
    Seq("lineitem", "orders", "customer", "nation", "region").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  test("TPC-H Q1 as literal SQL matches the DataFrame formulation") {
    registerTables()
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        | round(cast(sum(cast(l_quantity AS decimal(18,2))) AS double), 2) AS sum_qty,
        | round(cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double), 2) AS sum_base_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= timestamp '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(sql.count() > 0)
    // shape check against the registered query (column subset)
    val df = queries.RelationalQueries.q02.fn(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "count_order")
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("star join with CTE + window as literal SQL runs and aggregates") {
    registerTables()
    val rows = spark.sql(
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment, n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT n_name, c_mktsegment, cnt,
        | rank() OVER (PARTITION BY n_name ORDER BY cnt DESC, c_mktsegment) AS rk
        |FROM (SELECT n_name, c_mktsegment, count(*) AS cnt
        |      FROM cust GROUP BY n_name, c_mktsegment)""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.filter(_.getAs[Int]("rk") == 1).nonEmpty)
  }

  test("graft extension functions are callable from literal SQL") {
    val r = spark.sql(
      """SELECT
        | graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS cos,
        | graft_slot_agree(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS agree,
        | graft_st_contains(array(0D, 10D, 10D, 0D), array(0D, 0D, 10D, 10D), 5D, 5D) AS inside,
        | graft_st_contains(array(0D, 10D, 10D, 0D), array(0D, 0D, 10D, 10D), 15D, 5D) AS outside
        |""".stripMargin).head
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(r.getAs[Int]("agree") == 2)
    assert(r.getAs[Boolean]("inside"))
    assert(!r.getAs[Boolean]("outside"))
  }

  test("graft_hdr_quantile and graft_shingle-family SQL functions aggregate end to end") {
    registerTables()
    val q = spark.sql(
      """SELECT l_returnflag,
        | graft_hdr_quantile(cast(round(l_extendedprice * 100) AS bigint), 0.5) AS p50c
        |FROM lineitem GROUP BY l_returnflag""".stripMargin).collect()
    assert(q.length == 3 && q.forall(_.getAs[Double]("p50c") > 0))
    val m = spark.sql(
      "SELECT graft_minhash(array('a b c', 'b c d'), 8) AS sig").head
    assert(m.getSeq[Long](0).length == 8)
  }
}
