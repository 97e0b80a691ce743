package graft

import org.apache.spark.sql.functions._

import graft.plans.{LineOps, NativeFunctions}

/** line_locate_point / line_interpolate_point laws (plans/LineExprs):
  * the reference's published test vectors reproduce exactly
  * (TestGeoFunctions.java:495-530), the SQL faces carry the null/empty
  * and fraction-range contracts, and the DuckDB-oracle unrolling is
  * validated bit-exactly against the kernel in q174's Verify run.
  */
class LineSpec extends SparkSpec {
  import spark.implicits._

  private def locate(verts: Seq[(Double, Double)], px: Double, py: Double): Double =
    Seq((verts.map(_._1), verts.map(_._2), px, py))
      .toDF("xs", "ys", "px", "py")
      .select(NativeFunctions.lineLocatePoint(col("xs"), col("ys"),
        col("px"), col("py")).as("v"))
      .head().getDouble(0)

  private def interp(verts: Seq[(Double, Double)], f: Double): (Double, Double) = {
    val r = Seq((verts.map(_._1), verts.map(_._2), f)).toDF("xs", "ys", "f")
      .select(NativeFunctions.lineInterpolateX(col("xs"), col("ys"), col("f")).as("x"),
        NativeFunctions.lineInterpolateY(col("xs"), col("ys"), col("f")).as("y"))
      .head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("line_locate_point reproduces the reference's vectors exactly") {
    val v01 = Seq((0.0, 0.0), (0.0, 1.0))
    assert(locate(v01, 0.0, 0.2) == 0.2)
    assert(locate(v01, 0.0, 0.0) == 0.0)
    assert(locate(v01, 0.0, -1.0) == 0.0) // clamps before the start
    assert(locate(v01, 0.0, 1.0) == 1.0)
    assert(locate(v01, 0.0, 2.0) == 1.0) // clamps past the end
    val bent = Seq((0.0, 0.0), (0.0, 1.0), (2.0, 1.0))
    assert(locate(bent, 0.0, 0.2) == 0.06666666666666667)
    assert(locate(bent, 0.9, 1.0) == 0.6333333333333333)
    val diag = Seq((1.0, 3.0), (5.0, 4.0))
    assert(locate(diag, 1.0, 3.0) == 0.0)
    assert(locate(diag, 2.0, 3.0) == 0.23529411764705882)
    assert(locate(diag, 5.0, 4.0) == 1.0)
  }

  test("line_interpolate_point reproduces the reference's vectors exactly") {
    val v01 = Seq((0.0, 0.0), (0.0, 1.0))
    assert(interp(v01, 0.2) == ((0.0, 0.2)))
    assert(interp(v01, 0.0) == ((0.0, 0.0)))
    assert(interp(v01, 1.0) == ((0.0, 1.0)))
    val bent = Seq((0.0, 0.0), (0.0, 1.0), (3.0, 1.0))
    assert(interp(bent, 0.0625) == ((0.0, 0.25)))
    assert(interp(bent, 0.75) == ((2.0, 1.0)))
    val diag = Seq((1.0, 3.0), (5.0, 4.0))
    assert(interp(diag, 0.0) == ((1.0, 3.0)))
    assert(interp(diag, 0.25) == ((2.0, 3.25)))
    assert(interp(diag, 1.0) == ((5.0, 4.0)))
  }

  test("zero-length interior segments walk through without dividing by zero") {
    val dup = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 0.0), (2.0, 0.0))
    assert(locate(dup, 1.0, 5.0) == 0.5)
    assert(interp(dup, 0.5) == ((1.0, 0.0)))
    assert(interp(dup, 1.0) == ((2.0, 0.0)))
  }

  test("fraction outside [0, 1] throws the reference's message verbatim") {
    // TestGeoFunctions.java:529-530
    for (bad <- Seq(-1.0, 1.5)) {
      val e = intercept[Exception](interp(Seq((0.0, 0.0), (0.0, 1.0), (2.0, 1.0)), bad))
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
      assert(all(e).exists(_.contains(
        s"line_interpolate_point: Fraction must be between 0 and 1, but is $bad")),
        s"wrong message for $bad: ${all(e)}")
    }
  }

  test("the SQL faces carry the empty/NULL contract") {
    val df = Seq((Seq.empty[Double], Seq.empty[Double], 0.5, 0.5))
      .toDF("xs", "ys", "px", "py")
    df.createOrReplaceTempView("line_probe")
    val r = spark.sql(
      """SELECT graft_line_locate_point(xs, ys, px, py) AS loc,
        |  graft_line_interpolate_point(xs, ys, 0.5) AS pt
        |FROM line_probe""".stripMargin).head()
    assert(r.isNullAt(0), "empty line must locate to NULL")
    assert(r.isNullAt(1), "empty line must interpolate to the empty (NULL) point")
    // non-empty via SQL matches the kernel
    val ok = spark.sql(
      """SELECT graft_line_locate_point(array(1.0d, 5.0d), array(3.0d, 4.0d), 2.0d, 3.0d) AS loc,
        |  graft_line_interpolate_point(array(1.0d, 5.0d), array(3.0d, 4.0d), 0.25d) AS pt
        |""".stripMargin).head()
    assert(ok.getDouble(0) == 0.23529411764705882)
    val pt = ok.getStruct(1)
    assert((pt.getDouble(0), pt.getDouble(1)) == ((2.0, 3.25)))
  }

  test("NULL linestring / NULL fraction interpolate to NULL, not struct(NULL, NULL)") {
    // r8 ADVICE: a NULL linestring used to fall through to the struct
    // branch (a non-null struct of two NULLs), and an EMPTY line with a
    // NULL fraction nulled the range check into raise_error(NULL).
    val r = spark.sql(
      """SELECT
        |  graft_line_interpolate_point(CAST(NULL AS array<double>), array(1.0d), 0.5) AS a,
        |  graft_line_interpolate_point(array(1.0d, 2.0d), array(1.0d, 2.0d), CAST(NULL AS double)) AS b,
        |  graft_line_interpolate_point(CAST(NULL AS array<double>), CAST(NULL AS array<double>), CAST(NULL AS double)) AS c,
        |  graft_line_interpolate_point(CAST(array() AS array<double>), CAST(array() AS array<double>), CAST(NULL AS double)) AS d
        |""".stripMargin).head()
    (0 to 3).foreach(i => assert(r.isNullAt(i), s"col $i must be NULL, got ${r.get(i)}"))
  }

  test("the DuckDB-oracle unrolling matches the kernel on a literal grid") {
    // replay locateDuckSql/interpDuckSql through Spark's own SQL engine:
    // the unrolled text is engine-portable arithmetic (CAST/CASE/
    // list_reduce is DuckDB-only, so only interp is replayable here;
    // locate parity is carried by the q174 Verify compare)
    val line = Seq((-15.0, -10.0), (5.0, 2.5), (18.0, 2.5), (18.0, -12.0))
    val sql = LineOps.interpDuckSql(line, "f", wantX = true)
      .replace("CAST(0 AS DOUBLE)", "cast(0 as double)")
    val grid = (0 to 100).map(_ / 100.0)
    val viaSql = grid.toDF("f").selectExpr(s"$sql AS v").collect().map(_.getDouble(0))
    val viaKernel = grid.map(f => interpOne(line, f))
    assert(viaSql.toSeq == viaKernel)
  }

  private def interpOne(verts: Seq[(Double, Double)], f: Double): Double =
    Seq((verts.map(_._1), verts.map(_._2), f)).toDF("xs", "ys", "f")
      .select(NativeFunctions.lineInterpolateX(col("xs"), col("ys"), col("f")).as("x"))
      .head().getDouble(0)
}
