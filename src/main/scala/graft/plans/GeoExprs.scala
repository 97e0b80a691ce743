package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Point-in-polygon via even-odd ray casting (reference semantics:
  * presto-geospatial/src/main/java/com/facebook/presto/geospatial/
  * GeoFunctions.java:1 ST_Contains, restricted to point arguments and a
  * simple polygon).
  *
  * The crossing test for edge (x1,y1)→(x2,y2) is evaluated EXACTLY as
  *   ((y1 > y) != (y2 > y)) && x < x1 + (y − y1)·(x2 − x1)/(y2 − y1)
  * in that operation order, because the DuckDB oracle replays the same
  * per-edge terms unrolled from the same vertex literals — identical
  * IEEE mul-then-div keeps the two engines bit-equal even for points
  * near an edge. Boundary points follow the even-odd convention (not
  * topological ST_Contains — exact boundary cases are measure-zero for
  * the md5-derived test points).
  */
case class StContains(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(ArrayType(DoubleType, _), ArrayType(DoubleType, _),
        DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case ts => TypeCheckResult.TypeCheckFailure(
        s"graft_st_contains requires (array<double>, array<double>, double, double), got $ts")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_st_contains"

  override protected def nullSafeEval(lats: Any, lons: Any, lat: Any, lon: Any): Any =
    StContains.compute(lats.asInstanceOf[ArrayData], lons.asInstanceOf[ArrayData],
      lat.asInstanceOf[Double], lon.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.plans.StContains.compute($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): StContains =
    StContains(newFirst, newSecond, newThird, newFourth)
}

object StContains {
  def compute(lats: ArrayData, lons: ArrayData, lat: Double, lon: Double): Boolean = {
    val n = lats.numElements()
    var inside = false
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      val y1 = lats.getDouble(i); val x1 = lons.getDouble(i)
      val y2 = lats.getDouble(j); val x2 = lons.getDouble(j)
      if (((y1 > lat) != (y2 > lat)) &&
          lon < x1 + (lat - y1) * (x2 - x1) / (y2 - y1)) {
        inside = !inside
      }
      i += 1
    }
    inside
  }

  /** The same per-edge terms as [[compute]], unrolled into a DuckDB SQL
    * boolean expression from the vertex literals — keeps the oracle
    * bit-identical to the kernel. Literals are embedded as STRING casts
    * (r8, the LineOps lesson): DuckDB parses a bare 17-digit decimal
    * literal through DECIMAL and can land one ulp off the double
    * Double.toString names; CAST('…' AS DOUBLE) goes through strtod
    * and round-trips exactly. (The q89 vertex set is short decimals
    * where both parses agree — this is hardening for arbitrary
    * vertices, not a behavior change there.)
    */
  def duckSql(vertices: Seq[(Double, Double)], latCol: String, lonCol: String): String = {
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    val terms = vertices.indices.map { i =>
      val j = (i + 1) % vertices.length
      val (y1, x1) = vertices(i)
      val (y2, x2) = vertices(j)
      // a horizontal edge can never satisfy (y1 > lat) != (y2 > lat);
      // emit 0 instead of a divide-by-zero term
      if (y2 == y1) "0"
      else s"(CASE WHEN ((${d(y1)} > $latCol) != (${d(y2)} > $latCol)) AND " +
        s"$lonCol < ${d(x1)} + ($latCol - ${d(y1)}) * ${d(x2 - x1)} / ${d(y2 - y1)} " +
        "THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }
}
