package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed spatial join: point-in-polygon as a grid-cell EQUI-join +
  * exact ray-cast verification — the Spark re-expression of the
  * reference's partitioned spatial join (reference:
  * presto-geospatial-toolkit/src/main/java/com/facebook/presto/
  * geospatial/KdbTree.java:1 spatial partitioning,
  * presto-main/.../operator/SpatialIndexBuilderOperator.java:1).
  *
  * Scale design: polygons are decomposed into the fixed-grid cells
  * their envelopes cover (small build side — broadcast); points compute
  * their single cell id; the join is a plain hash equi-join on cell id,
  * so candidate pairs are bounded by per-cell occupancy — never a
  * nested-loop over points × polygons. The exact `graft_st_contains`
  * ray-cast then verifies each candidate. At 100 TB the grid index is
  * the persisted layout (bucket/partition by cell id) and skewed cells
  * (cities) split by the usual AQE/salting machinery; a KdbTree-style
  * adaptive grid changes only how `envelopeCells` is computed.
  */
object SpatialJoin {

  /** Flat cell id of a point on a `cellDeg` grid. Both engines derive
    * it with the same double arithmetic (floor of identically-computed
    * doubles is bit-identical), so the DuckDB oracle replays it.
    */
  def cellOf(lat: Column, lon: Column, cellDeg: Double): Column =
    floor((lat + lit(90.0)) / lit(cellDeg)).cast("long") * lit(1000L) +
      floor((lon + lit(180.0)) / lit(cellDeg)).cast("long")

  /** Same cell id as a DuckDB SQL fragment (oracle replay). */
  def cellOfDuck(lat: String, lon: String, cellDeg: Double): String =
    s"CAST(floor(($lat + 90.0) / $cellDeg) AS BIGINT) * 1000 + " +
      s"CAST(floor(($lon + 180.0) / $cellDeg) AS BIGINT)"

  /** All grid cells covered by a polygon's envelope. */
  def envelopeCells(verts: Seq[(Double, Double)], cellDeg: Double): Seq[Long] = {
    def cellIdx(v: Double, off: Double) = math.floor((v + off) / cellDeg).toLong
    val (lats, lons) = (verts.map(_._1), verts.map(_._2))
    for {
      cy <- cellIdx(lats.min, 90.0) to cellIdx(lats.max, 90.0)
      cx <- cellIdx(lons.min, 180.0) to cellIdx(lons.max, 180.0)
    } yield cy * 1000L + cx
  }

  /** Candidate pairs (point × polygon sharing a grid cell) with the
    * exact containment verdict. `points` must carry double `lat`/`lon`
    * columns; all point columns are preserved, `poly_id` and `inside`
    * are appended. Aggregate or filter downstream as needed.
    */
  def containsJoin(points: DataFrame,
                   polys: Seq[(Int, Seq[(Double, Double)])],
                   cellDeg: Double = 20.0): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // build side: one row per (polygon, covered cell), vertex arrays
    // carried along — literal-sized, broadcast
    val cellsDf = broadcast(polys.flatMap { case (pid, verts) =>
      envelopeCells(verts, cellDeg).map(c =>
        (pid, c, verts.map(_._1), verts.map(_._2)))
    }.toDF("poly_id", "cell", "poly_lats", "poly_lons"))
    points
      .withColumn("cell", cellOf(col("lat"), col("lon"), cellDeg))
      .join(cellsDf, "cell")
      .withColumn("inside", graft.plans.NativeFunctions.stContains(
        col("poly_lats"), col("poly_lons"), col("lat"), col("lon")))
      .drop("cell", "poly_lats", "poly_lons")
  }
}
