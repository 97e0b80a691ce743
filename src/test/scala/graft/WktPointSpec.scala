package graft

import org.apache.spark.sql.functions._

import graft.functions.Geo

/** The WKT point subset (q168): fixed-3-decimal text from integer
  * milli-degrees, exact parse-back, and the sign/zero edge cases that
  * double→decimal casts get wrong cross-engine.
  */
class WktPointSpec extends SparkSpec {

  private def render(lonM: Long, latM: Long): (String, Double, Double) = {
    import spark.implicits._
    val r = Seq((lonM, latM)).toDF("lon_m", "lat_m")
      .select(Geo.wktPoint(col("lon_m"), col("lat_m")).as("wkt"))
      .select(col("wkt"), Geo.wktX(col("wkt")).as("x"), Geo.wktY(col("wkt")).as("y"))
      .collect().head
    (r.getString(0), r.getDouble(1), r.getDouble(2))
  }

  test("formats positive, negative, and sub-degree coordinates") {
    assert(render(12345L, -500L) == ("POINT (12.345 -0.500)", 12.345, -0.5))
  }

  test("negative sub-degree keeps the sign on the whole part") {
    val (wkt, x, y) = render(-999L, 60000L)
    assert(wkt == "POINT (-0.999 60.000)" && x == -0.999 && y == 60.0)
  }

  test("zero renders unsigned") {
    assert(render(0L, 0L)._1 == "POINT (0.000 0.000)")
  }

  test("round-trip equals millis/1000.0 exactly for every grid point") {
    import spark.implicits._
    // 3-decimal literals and m/1000.0 are both nearest-double of the
    // same rational — exact equality must hold across the whole range
    val df = spark.range(-180000L, 180001L, 1777L)
      .select(col("id").as("m"))
      .select(col("m"), Geo.wktX(Geo.wktPoint(col("m"), col("m"))).as("x"))
      .filter(col("x") =!= col("m").cast("double") / 1000.0)
    assert(df.count() == 0)
  }
}
