package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** line_locate_point / line_interpolate_point over linestrings given
  * as parallel vertex arrays (reference presto-main/.../geospatial/
  * GeoFunctions.java:442/:467, geospatial.rst:449/:456 — both delegate
  * to JTS LengthIndexedLine).
  *
  * These two are pure vertex-segment linear interpolation — projection,
  * clamp, prefix length — with none of the snap-rounding or orientation
  * predicates that keep the curved-geometry kernel excluded (SURVEY
  * §2.2): the q154/q89 exact-arithmetic discipline applies. Every
  * operation is evaluated in a FIXED order (documented per kernel)
  * because the DuckDB oracle replays the same arithmetic unrolled from
  * the same vertex literals ([[LineOps.locateDuckSql]] /
  * [[LineOps.interpDuckSql]]), keeping the two engines bit-equal.
  *
  * Matching JTS semantics:
  *  - locate: the FIRST segment attaining the minimal point-to-segment
  *    distance wins (strict `<` update — LocationIndexOfPoint), the
  *    projection parameter is clamped to [0, 1], and the result is the
  *    length prefix over the total 2-D length;
  *  - interpolate: walks segments until the remaining target length
  *    fits (`rem <= slen`, falling through to the last segment), then
  *    interpolates linearly; the in-segment parameter is capped at 1
  *    (LinearLocation normalization), so fraction 1 lands exactly on
  *    the final vertex.
  *
  * Contract edges, at the registered SQL face (GraftExtensions), as in
  * the reference: NULL line/point/fraction → NULL; an EMPTY line →
  * NULL locate and the empty (NULL) point (the Envelope convention for
  * empty geometries); fraction outside [0, 1] throws the reference's
  * message verbatim. The kernels themselves require ≥ 2 vertices; a
  * zero-length (degenerate) line yields NaN from the final 0/0 as the
  * underlying JTS division does. Zero-length interior segments are
  * handled (projection parameter 0, zero walk advance).
  */
object LineOps {
  /** Fraction in [0, 1] of the closest point on the line to (px, py).
    * Op order per segment i:
    *   dx = x[i+1] − x[i]; dy likewise; l2 = dx·dx + dy·dy
    *   t0 = ((px − x1)·dx + (py − y1)·dy) / l2   (0 for l2 = 0)
    *   t  = clamp(t0); qx = x1 + t·dx; qy = y1 + t·dy
    *   d2 = (px − qx)² + (py − qy)²; best updates on strict <
    *   prefix = cum + t·sqrt(l2); cum += sqrt(l2)
    */
  def locate(xs: ArrayData, ys: ArrayData, px: Double, py: Double): Double = {
    val n = xs.numElements()
    var bestD2 = Double.MaxValue
    var bestLen = 0.0
    var cum = 0.0
    var i = 0
    while (i < n - 1) {
      val x1 = xs.getDouble(i); val y1 = ys.getDouble(i)
      val dx = xs.getDouble(i + 1) - x1
      val dy = ys.getDouble(i + 1) - y1
      val l2 = dx * dx + dy * dy
      val slen = math.sqrt(l2)
      val t0 = if (l2 == 0.0) 0.0 else ((px - x1) * dx + (py - y1) * dy) / l2
      val t = if (t0 < 0.0) 0.0 else if (t0 > 1.0) 1.0 else t0
      val qx = x1 + t * dx; val qy = y1 + t * dy
      val d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
      if (d2 < bestD2) { bestD2 = d2; bestLen = cum + t * slen }
      cum += slen
      i += 1
    }
    bestLen / cum
  }

  private def checkFraction(f: Double): Unit =
    if (!(f >= 0.0 && f <= 1.0))
      throw new IllegalArgumentException(
        s"line_interpolate_point: Fraction must be between 0 and 1, but is $f")

  /** X of the point at `f` of total length. Walk order: rem starts at
    * f·total and decreases by slen sequentially (NOT f·total − prefix:
    * sequential subtraction is what the oracle replays).
    */
  def interpX(xs: ArrayData, ys: ArrayData, f: Double): Double =
    interp(xs, ys, f, wantX = true)

  /** Y companion of [[interpX]] — same walk. */
  def interpY(xs: ArrayData, ys: ArrayData, f: Double): Double =
    interp(xs, ys, f, wantX = false)

  private def interp(xs: ArrayData, ys: ArrayData, f: Double, wantX: Boolean): Double = {
    checkFraction(f)
    val n = xs.numElements()
    var total = 0.0
    var i = 0
    while (i < n - 1) {
      val dx = xs.getDouble(i + 1) - xs.getDouble(i)
      val dy = ys.getDouble(i + 1) - ys.getDouble(i)
      total += math.sqrt(dx * dx + dy * dy)
      i += 1
    }
    var rem = f * total
    i = 0
    while (i < n - 1) {
      val x1 = xs.getDouble(i); val y1 = ys.getDouble(i)
      val dx = xs.getDouble(i + 1) - x1
      val dy = ys.getDouble(i + 1) - y1
      val slen = math.sqrt(dx * dx + dy * dy)
      if (rem <= slen || i == n - 2) {
        val t0 = if (slen == 0.0) 0.0 else rem / slen
        val t = if (t0 > 1.0) 1.0 else t0
        return if (wantX) x1 + t * dx else y1 + t * dy
      }
      rem -= slen
      i += 1
    }
    // single-vertex line: the vertex itself
    if (wantX) xs.getDouble(0) else ys.getDouble(0)
  }

  // string-cast, not a bare numeric literal: DuckDB parses bare
  // decimal literals through DECIMAL and can land one ulp off for
  // 17-digit values (e.g. 11.313708498984761); CAST('…' AS DOUBLE)
  // goes through strtod and round-trips Double.toString exactly
  private def d(v: Double): String = s"CAST('$v' AS DOUBLE)"

  private case class Seg(x1: Double, y1: Double, dx: Double, dy: Double,
      l2: Double, slen: Double, cumBefore: Double)

  private def segments(verts: Seq[(Double, Double)]): (Seq[Seg], Double) = {
    var cum = 0.0
    val segs = verts.init.zip(verts.tail).map { case ((x1, y1), (x2, y2)) =>
      val dx = x2 - x1; val dy = y2 - y1
      val l2 = dx * dx + dy * dy
      val slen = math.sqrt(l2)
      val s = Seg(x1, y1, dx, dy, l2, slen, cum)
      cum += slen
      s
    }
    (segs, cum)
  }

  /** [[locate]] unrolled into DuckDB SQL from vertex literals: the
    * per-segment (d2, prefix) terms fold through list_reduce with the
    * kernel's strict-< first-wins update; slen/cumBefore/total are
    * Scala-precomputed with the kernel's own op order, so every
    * embedded literal is the exact double the kernel derives at
    * runtime (Double.toString round-trips).
    */
  def locateDuckSql(verts: Seq[(Double, Double)], px: String, py: String): String = {
    val (segs, total) = segments(verts)
    val terms = segs.map { s =>
      val t0 = s"((($px - ${d(s.x1)}) * ${d(s.dx)} + ($py - ${d(s.y1)}) * ${d(s.dy)}) / ${d(s.l2)})"
      val t = if (s.l2 == 0.0) "CAST(0 AS DOUBLE)"
        else s"(CASE WHEN $t0 < 0 THEN 0 WHEN $t0 > 1 THEN 1 ELSE $t0 END)"
      val qx = s"(${d(s.x1)} + $t * ${d(s.dx)})"
      val qy = s"(${d(s.y1)} + $t * ${d(s.dy)})"
      val d2 = s"(($px - $qx) * ($px - $qx) + ($py - $qy) * ($py - $qy))"
      s"struct_pack(d2 := $d2, pre := ${d(s.cumBefore)} + $t * ${d(s.slen)})"
    }
    s"""(list_reduce(list_prepend(
       |   struct_pack(d2 := CAST(${Double.MaxValue} AS DOUBLE), pre := CAST(0 AS DOUBLE)),
       |   [${terms.mkString(",\n    ")}]),
       |  (acc, s) -> CASE WHEN s.d2 < acc.d2 THEN s ELSE acc END).pre / ${d(total)})""".stripMargin
  }

  /** [[interpX]]/[[interpY]] unrolled into DuckDB SQL: nested CASE in
    * the kernel's walk order, with the sequential rem subtraction
    * replayed literally (((f·total − s0) − s1) − …).
    */
  def interpDuckSql(verts: Seq[(Double, Double)], fExpr: String, wantX: Boolean): String = {
    val (segs, total) = segments(verts)
    var rem = s"(($fExpr) * ${d(total)})"
    val branches = segs.zipWithIndex.map { case (s, i) =>
      val t0 = s"($rem / ${d(s.slen)})"
      val t = if (s.slen == 0.0) "CAST(0 AS DOUBLE)"
        else s"(CASE WHEN $t0 > 1 THEN 1 ELSE $t0 END)"
      val v = if (wantX) s"(${d(s.x1)} + $t * ${d(s.dx)})"
        else s"(${d(s.y1)} + $t * ${d(s.dy)})"
      val cond = s"$rem <= ${d(s.slen)}"
      rem = s"($rem - ${d(s.slen)})"
      if (i == segs.length - 1) s"ELSE $v END" else s"WHEN $cond THEN $v"
    }
    if (segs.isEmpty) {
      val (x0, y0) = verts.head
      if (wantX) d(x0) else d(y0)
    } else if (segs.length == 1) {
      // a single segment is the ELSE branch alone — no CASE needed
      branches.head.stripPrefix("ELSE ").stripSuffix(" END")
    } else s"(CASE ${branches.mkString("\n  ")})"
  }
}

private[plans] trait LineStringArgs {
  self: Expression =>
  protected def arrayArgs: Int
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.take(arrayArgs).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && children.drop(arrayArgs).forall(_.dataType == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $arrayArgs array<double> then double arguments, got " +
        children.map(_.dataType).mkString(", "))
  }
}

/** graft_line_locate_point(xs, ys, px, py) → fraction in [0, 1]. */
case class LineLocatePoint(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
  extends QuaternaryExpression with LineStringArgs {
  override protected def arrayArgs: Int = 2
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_line_locate_point"

  override protected def nullSafeEval(xs: Any, ys: Any, px: Any, py: Any): Any =
    LineOps.locate(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData],
      px.asInstanceOf[Double], py.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, e) => s"graft.plans.LineOps.locate($a, $b, $c, $e)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): LineLocatePoint =
    LineLocatePoint(f, s, t, q)
}

/** X coordinate of line_interpolate_point(xs, ys, fraction). */
case class LineInterpolateX(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with LineStringArgs {
  override protected def arrayArgs: Int = 2
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_line_interpolate_x"

  override protected def nullSafeEval(xs: Any, ys: Any, f: Any): Any =
    LineOps.interpX(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData],
      f.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.plans.LineOps.interpX($a, $b, $c)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LineInterpolateX =
    LineInterpolateX(f, s, t)
}

/** Y coordinate of line_interpolate_point(xs, ys, fraction). */
case class LineInterpolateY(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with LineStringArgs {
  override protected def arrayArgs: Int = 2
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_line_interpolate_y"

  override protected def nullSafeEval(xs: Any, ys: Any, f: Any): Any =
    LineOps.interpY(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData],
      f.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.plans.LineOps.interpY($a, $b, $c)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LineInterpolateY =
    LineInterpolateY(f, s, t)
}
