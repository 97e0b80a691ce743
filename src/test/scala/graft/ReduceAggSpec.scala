package graft

import org.apache.spark.sql.functions._
import graft.plans.Reduce

/** reduce_agg (graft.plans.Reduce): user-defined declarative fold. */
class ReduceAggSpec extends SparkSpec {
  private val M = 2147483647L

  private def modProduct = Reduce.reduceAgg(col("v"), lit(1L))(
    (s, t) => (s * t) % M, (a, b) => (a * b) % M)

  test("fold matches a driver-side reference fold and is partition-invariant") {
    import spark.implicits._
    val vals = (1 to 500).map(i => (i % 5, (i.toLong * 7919) % 1000003 + 2))
    val df = vals.toDF("g", "v")
    val expected = vals.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).foldLeft(1L)((s, t) => (s * t) % M)
    }
    for (parts <- Seq(1, 8, 32)) {
      val got = df.repartition(parts).groupBy("g").agg(modProduct.as("p"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("input is coerced to the state type (int input, long state)") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4).toDF("v") // IntegerType input, LongType init
    val got = df.agg(Reduce.reduceAgg(col("v"), lit(0L))(
      (s, t) => s + t * t, (a, b) => a + b)).collect()(0).getLong(0)
    assert(got == 1L + 4 + 9 + 16)
  }

  test("plan does partial aggregation (two HashAggregate stages, no collect_list)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("g", "v")
    val plan = df.groupBy("g").agg(modProduct.as("p"))
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(!plan.contains("collect_list"))
  }

  test("empty relation folds to no rows; whole-table fold yields init on empty group") {
    import spark.implicits._
    val empty = Seq.empty[(Int, Long)].toDF("g", "v")
    assert(empty.groupBy("g").agg(modProduct).collect().isEmpty)
    // global aggregation over an empty frame returns the initial state
    assert(empty.agg(modProduct).collect()(0).getLong(0) == 1L)
  }
}
