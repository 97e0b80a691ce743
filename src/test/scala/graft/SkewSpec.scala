package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join must be a drop-in equivalent of the plain equi-join. */
class SkewSpec extends SparkSpec {

  test("saltedJoin(lineitem, orders-slice) equals the unsalted join") {
    val big = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val small = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_orderpriority")
    val plain = big.join(small, "o_orderkey")
    val salted = Skew.saltedJoin(big, small, "o_orderkey", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(sum(col("l_quantity").cast("decimal(18,2)"))).head().getDecimal(0) ==
      plain.select(sum(col("l_quantity").cast("decimal(18,2)"))).head().getDecimal(0))
  }
}
