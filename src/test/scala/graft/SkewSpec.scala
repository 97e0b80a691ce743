package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join must be a drop-in equivalent of the plain equi-join. */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    import spark.implicits._
    // one hot key dominating the big side; thresholds lowered so the
    // test corpus trips the same machinery a hot key trips at 100 TB
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val big = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("v"))
      val small = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(small, "k")
      // execute THIS dataset's own QueryExecution (count() would plan a
      // separate aggregate query and leave this one unexecuted)
      val n = joined.queryExecution.toRdd.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

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
