package graft

import org.apache.spark.sql.functions._

import graft.functions.Maps

/** The single-pass mapUnions must agree with the per-aggregate forms it
  * replaces (q110's r6 plan diet) — same maps, any grouping, ties and
  * disjoint key sets included.
  */
class MapsSpec extends SparkSpec {

  private lazy val maps = {
    import spark.implicits._
    // 40 groups × 3 rows, overlapping small key spaces with collisions
    (1L to 120L).map { i =>
      (i % 40, Map(s"k${i % 5}" -> i, s"k${(i * 7) % 5}" -> (i * 3), s"x$i" -> i))
    }.toDF("g", "m")
  }

  test("mapUnions == mapUnionMax ⋈ mapUnionSum") {
    val one = Maps.mapUnions(maps, Seq("g"), "m", "a_max", "a_sum")
    val two = Maps.mapUnionMax(maps, Seq("g"), "m", "b_max")
      .join(Maps.mapUnionSum(maps, Seq("g"), "m", "b_sum"), "g")
    val joined = one.join(two, "g")
    assert(joined.count() == 40)
    // maps have no equality ordering — compare the (sorted) entry lists
    assert(joined.filter(map_entries(col("a_max")) =!= map_entries(col("b_max")) ||
      map_entries(col("a_sum")) =!= map_entries(col("b_sum"))).count() == 0)
  }

  test("duplicate keys resolve max-wins / sum across rows") {
    import spark.implicits._
    val df = Seq((1, Map("a" -> 2L, "b" -> 5L)), (1, Map("a" -> 7L)))
      .toDF("g", "m")
    val r = Maps.mapUnions(df, Seq("g"), "m").collect().head
    assert(r.getMap[String, Long](1) == Map("a" -> 7L, "b" -> 5L))
    assert(r.getMap[String, Long](2) == Map("a" -> 9L, "b" -> 5L))
  }
}
