package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.plans.NativeFunctions

/** Exactness, partition invariance, and eviction-regime error bounds of
  * the SpaceSaving heavy-hitters sketch (graft.plans.SpaceSavingAgg).
  */
class SpaceSavingSpec extends SparkSpec {

  import spark.implicits._

  private def topk(rows: Seq[Row]): Seq[(Long, Long)] =
    rows.head.getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1)))

  test("exact regime (distinct < capacity): matches exact counts, any partitioning") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long").as("v"))
    val exact = li.groupBy("v").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (v, c) => (-c, v) }.take(5).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val approx = topk(li.repartition(parts)
        .agg(NativeFunctions.approxMostFrequent(col("v"), 64, 5).as("hh"))
        .collect().toIndexedSeq)
      assert(approx === exact, s"parts=$parts")
    }
  }

  test("eviction regime: capacity 8 over 100 distinct still surfaces the heavy hitter") {
    // skewed stream: value 1 appears 1000 times, 2..100 once each
    val data = (Seq.fill(1000)(1L) ++ (2L to 100L)).toDF("v")
    val res = topk(data.repartition(13)
      .agg(NativeFunctions.approxMostFrequent(col("v"), 8, 3).as("hh"))
      .collect().toIndexedSeq)
    val n = 1099L
    assert(res.head._1 === 1L, s"heavy hitter missed: $res")
    // SpaceSaving counts only ever overestimate, by at most N/capacity
    // per merged sketch; with a 13-way merge the per-partition errors
    // add, but the reported count still brackets the true count
    assert(res.head._2 >= 1000L && res.head._2 <= 1000L + n,
      s"count ${res.head._2} outside [1000, ${1000 + n}]")
  }

  test("merge is order-insensitive in the exact regime: rollup equals direct") {
    val ev = Tables.events(spark, sfDir).select(col("event_type").as("v"))
      .select(xxhash64(col("v")).as("v")) // long-typed values
    val direct = topk(ev.agg(
      NativeFunctions.approxMostFrequent(col("v"), 32, 4).as("hh")).collect().toIndexedSeq)
    val shuffled = topk(ev.repartition(29).agg(
      NativeFunctions.approxMostFrequent(col("v"), 32, 4).as("hh")).collect().toIndexedSeq)
    assert(direct === shuffled)
  }

  test("string values work through the SQL registration") {
    Tables.events(spark, sfDir).createOrReplaceTempView("ss_events")
    val rows = spark.sql(
      """SELECT graft_approx_most_frequent(event_type, 16, 3) AS hh
        |FROM ss_events""".stripMargin).collect()
    val top = rows.head.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    val exact = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (v, c) => (-c, v) }.take(3).toSeq
    assert(top === exact)
  }
}
