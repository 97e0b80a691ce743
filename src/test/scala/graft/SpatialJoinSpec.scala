package graft

import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

/** Planted point-in-polygon cases + plan shape for the grid-bucketed
  * spatial join (graft.operators.SpatialJoin).
  */
class SpatialJoinSpec extends SparkSpec {

  import spark.implicits._

  // unit square around the origin and a far-away triangle
  private val polys: Seq[(Int, Seq[(Double, Double)])] = Seq(
    0 -> Seq((-5.0, -5.0), (-5.0, 5.0), (5.0, 5.0), (5.0, -5.0)),
    1 -> Seq((40.0, 100.0), (50.0, 110.0), (40.0, 120.0)))

  test("planted points land inside / candidate-only / pruned as expected") {
    val pts = Seq(
      (1L, 0.0, 0.0),     // inside the square
      (2L, 8.0, 8.0),     // same grid cell, outside the square
      (3L, 45.0, 110.0),  // inside the triangle
      (4L, -45.0, -110.0) // in no polygon's envelope cells
    ).toDF("pid", "lat", "lon")
    val res = SpatialJoin.containsJoin(pts, polys).collect()
    val byPoint = res.groupBy(_.getAs[Long]("pid"))
    assert(byPoint(1L).exists(r => r.getAs[Int]("poly_id") == 0 && r.getAs[Boolean]("inside")))
    assert(byPoint(2L).forall(r => !r.getAs[Boolean]("inside"))) // candidate but rejected
    assert(byPoint(3L).exists(r => r.getAs[Int]("poly_id") == 1 && r.getAs[Boolean]("inside")))
    assert(!byPoint.contains(4L)) // never even a candidate — cell pruning
  }

  test("a vertex-region point is classified identically by kernel and oracle formula") {
    // ray-cast parity between the native kernel and the unrolled SQL is
    // pinned by q89/q111's oracles; here just pin a boundary-ish case
    val pts = Seq((1L, 4.999, 4.999), (2L, 5.001, 5.001)).toDF("pid", "lat", "lon")
    val res = SpatialJoin.containsJoin(pts, polys)
      .filter(col("poly_id") === 0).collect()
      .map(r => r.getAs[Long]("pid") -> r.getAs[Boolean]("inside")).toMap
    assert(res(1L) === true)
    assert(res.getOrElse(2L, false) === false)
  }

  test("plan is a broadcast hash equi-join on cell — no nested-loop/cartesian") {
    // real varying coordinates: constant lat/lon would constant-fold the
    // cell key away and degrade the join to a nested loop by construction
    val (lat, lon) = graft.functions.Geo.pointFor(col("c_custkey"), 7)
    val pts = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), lat.as("lat"), lon.as("lon"))
    val plan = SpatialJoin.containsJoin(pts, polys).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
