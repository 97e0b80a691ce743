package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Envelope (axis-aligned box) geometry algebra — the rectilinear
  * subset of the reference's geometry-constructive functions
  * (geospatial.rst:186 `ST_Buffer`, :229 `ST_Union`,
  * `ST_Intersection`; impl presto-geospatial-toolkit/
  * GeoFunctions.java over ESRI geometries).
  *
  * Scope decision (SURVEY §2.2): general polygon clipping needs a
  * robust-arithmetic geometry kernel (ESRI/JTS/GEOS) whose snap
  * rounding and orientation predicates are library-version-coupled —
  * unoracleable cross-engine. The ENVELOPE algebra is the subset
  * every spatial pipeline actually runs at scale (filter pushdown,
  * tile cover, coarse joins — see operators/SpatialJoin and
  * functions/BingTile): buffer, intersection (boxes are closed under
  * it), union-envelope, area, and the containment/intersection
  * predicates — all min/max/± arithmetic, IEEE-deterministic, so the
  * DuckDB oracle replays it bit-for-bit.
  *
  * A box is a struct(xmin, ymin, xmax, ymax); a NULL box is the empty
  * geometry (every combinator is null-safe the SQL way: empty ∩ b =
  * empty, area(empty) = 0 via coalesce at the call site).
  */
object Envelope {

  def make(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    struct(xmin.as("xmin"), ymin.as("ymin"), xmax.as("xmax"), ymax.as("ymax"))

  private def f(b: Column, field: String): Column = b.getField(field)

  /** ST_Buffer of a box by `r` ≥ 0: the box dilated on every side (for
    * axis-aligned boxes the Minkowski sum with a square — the envelope
    * form of the reference's round buffer).
    */
  def buffer(b: Column, r: Column): Column =
    make(f(b, "xmin") - r, f(b, "ymin") - r, f(b, "xmax") + r, f(b, "ymax") + r)

  /** ST_Intersection of two boxes — boxes are closed under it; NULL
    * (empty) when they don't meet. Touching edges count as meeting
    * (area-0 box), matching the reference's closed-geometry semantics.
    */
  def intersection(a: Column, b: Column): Column = {
    val xmin = greatest(f(a, "xmin"), f(b, "xmin"))
    val ymin = greatest(f(a, "ymin"), f(b, "ymin"))
    val xmax = least(f(a, "xmax"), f(b, "xmax"))
    val ymax = least(f(a, "ymax"), f(b, "ymax"))
    when(xmin <= xmax && ymin <= ymax, make(xmin, ymin, xmax, ymax))
  }

  /** Envelope of the union of two boxes (ST_Envelope(ST_Union(a, b))
    * — the union itself is not a box; its envelope is what coarse
    * spatial plans consume).
    */
  def unionEnvelope(a: Column, b: Column): Column =
    make(least(f(a, "xmin"), f(b, "xmin")), least(f(a, "ymin"), f(b, "ymin")),
      greatest(f(a, "xmax"), f(b, "xmax")), greatest(f(a, "ymax"), f(b, "ymax")))

  /** ST_Area of a box; 0 for the empty geometry. */
  def area(b: Column): Column =
    coalesce((f(b, "xmax") - f(b, "xmin")) * (f(b, "ymax") - f(b, "ymin")), lit(0.0))

  /** ST_Intersects on boxes (closed: edge contact intersects). */
  def intersects(a: Column, b: Column): Column =
    f(a, "xmin") <= f(b, "xmax") && f(a, "xmax") >= f(b, "xmin") &&
      f(a, "ymin") <= f(b, "ymax") && f(a, "ymax") >= f(b, "ymin")

  /** ST_Contains: a contains b (closed, so shared edges still contain). */
  def contains(a: Column, b: Column): Column =
    f(a, "xmin") <= f(b, "xmin") && f(a, "xmax") >= f(b, "xmax") &&
      f(a, "ymin") <= f(b, "ymin") && f(a, "ymax") >= f(b, "ymax")
}
