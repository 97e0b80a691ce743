package graft

import org.apache.spark.sql.functions._

import graft.plans.{CdfNumerics, NativeFunctions}

/** Laws of the real-parameter CDF kernels (plans/CdfExprs.scala):
  *  - parity with commons-math (the reference's own delegate — on the
  *    Spark classpath) across randomized in-domain parameters;
  *  - the reference's published test vectors
  *    (presto-main/.../TestMathFunctions.java:1403, :1505) reproduce;
  *  - closed forms (arcsine beta, exponential/Erlang gamma, erf-form
  *    chi-squared) reproduce analytically;
  *  - the reference's domain-error contract throws;
  *  - the SQL registration evaluates through codegen.
  */
class CdfExprsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  test("beta_cdf parity with commons-math over randomized real parameters") {
    for (_ <- 1 to 300) {
      val a = 0.05 + rnd.nextDouble() * 20.0
      val b = 0.05 + rnd.nextDouble() * 20.0
      val x = rnd.nextDouble()
      val want = new org.apache.commons.math3.distribution.BetaDistribution(null, a, b,
        org.apache.commons.math3.distribution.BetaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
        .cumulativeProbability(x)
      val got = CdfNumerics.betaCdf(a, b, x)
      assert(math.abs(got - want) <= 1e-10,
        s"beta_cdf($a, $b, $x): got $got want $want")
    }
  }

  test("gamma_cdf parity with commons-math over randomized real parameters") {
    for (_ <- 1 to 300) {
      val shape = 0.05 + rnd.nextDouble() * 20.0
      val scale = 0.05 + rnd.nextDouble() * 10.0
      val v = rnd.nextDouble() * 60.0
      val want = new org.apache.commons.math3.distribution.GammaDistribution(null, shape, scale,
        org.apache.commons.math3.distribution.GammaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
        .cumulativeProbability(v)
      val got = CdfNumerics.gammaCdf(shape, scale, v)
      assert(math.abs(got - want) <= 1e-10,
        s"gamma_cdf($shape, $scale, $v): got $got want $want")
    }
  }

  test("the reference's published vectors reproduce") {
    assert(CdfNumerics.betaCdf(3, 3.6, 0.0) == 0.0)
    assert(CdfNumerics.betaCdf(3, 3.6, 1.0) == 1.0)
    assert(math.abs(CdfNumerics.betaCdf(3, 3.6, 0.3) - 0.21764809997679938) < 1e-12)
    assert(math.abs(CdfNumerics.betaCdf(3, 3.6, 0.9) - 0.9972502881611551) < 1e-12)
    assert(CdfNumerics.gammaCdf(3.0, 4.0, 0.0) == 0.0)
    assert(math.rint(CdfNumerics.gammaCdf(3.0, 4.0, 1.0) * 1000) / 1000 == 0.002)
    assert(math.rint(CdfNumerics.gammaCdf(3.0, 4.0, 5.0) * 1000) / 1000 == 0.132)
    assert(math.rint(CdfNumerics.gammaCdf(3.0, 4.0, 10.0) * 1000) / 1000 == 0.456)
    // chi²(10000) ≈ N(10000, ·): CDF at the mean ≈ 0.502 (reference's own check)
    assert(math.rint(CdfNumerics.gammaCdf(5000.0, 2.0, 10000.0) * 1000) / 1000 == 0.502)
  }

  test("closed forms reproduce analytically") {
    for (x <- Seq(0.05, 0.2, 0.5, 0.77, 0.99)) {
      // arcsine distribution: I_x(1/2, 1/2) = (2/π) asin(√x)
      assert(math.abs(CdfNumerics.betaCdf(0.5, 0.5, x) -
        2.0 / math.Pi * math.asin(math.sqrt(x))) < 1e-12, s"arcsine at $x")
      // uniform: I_x(1, 1) = x
      assert(math.abs(CdfNumerics.betaCdf(1.0, 1.0, x) - x) < 1e-12)
    }
    for (v <- Seq(0.1, 1.0, 3.7, 9.0)) {
      // exponential: gamma_cdf(1, θ, v) = 1 − e^{−v/θ}
      assert(math.abs(CdfNumerics.gammaCdf(1.0, 1.5, v) -
        (1.0 - math.exp(-v / 1.5))) < 1e-12, s"exponential at $v")
      // chi²(1): gamma_cdf(1/2, 2, v) = erf(√(v/2))
      assert(math.abs(CdfNumerics.gammaCdf(0.5, 2.0, v) -
        org.apache.commons.math3.special.Erf.erf(math.sqrt(v / 2.0))) < 1e-12,
        s"chi-squared(1) at $v")
    }
  }

  test("domain errors throw the reference's contract") {
    intercept[IllegalArgumentException](CdfNumerics.betaCdf(0.0, 3.0, 0.5))
    intercept[IllegalArgumentException](CdfNumerics.betaCdf(3.0, 0.0, 0.5))
    intercept[IllegalArgumentException](CdfNumerics.betaCdf(3.0, 3.0, 1.5))
    intercept[IllegalArgumentException](CdfNumerics.gammaCdf(0.0, 1.0, 1.0))
    intercept[IllegalArgumentException](CdfNumerics.gammaCdf(1.0, 0.0, 1.0))
    intercept[IllegalArgumentException](CdfNumerics.gammaCdf(1.0, 1.0, -0.1))
  }

  test("SQL registration and codegen path agree with the direct kernel") {
    val rows = (1 to 200).map { i =>
      (i.toLong, 0.3 + (i % 17) * 0.37, 0.4 + (i % 11) * 0.53, (i % 97) / 97.0)
    }
    val df = rows.toDF("id", "a", "b", "x")
    val viaSql = df.createOrReplaceTempView("cdf_probe")
    val got = spark.sql(
      """SELECT id, graft_beta_cdf(a, b, x) AS bc,
        |  graft_gamma_cdf(a, b, x * 10.0) AS gc FROM cdf_probe""".stripMargin)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("bc"), r.getAs[Double]("gc"))).toMap
    rows.foreach { case (id, a, b, x) =>
      val (bc, gc) = got(id)
      assert(bc == CdfNumerics.betaCdf(a, b, x), s"sql beta at $id")
      assert(gc == CdfNumerics.gammaCdf(a, b, x * 10.0), s"sql gamma at $id")
    }
    // Column API face
    val viaCol = df.select(
      NativeFunctions.betaCdf(col("a"), col("b"), col("x")).as("bc")).head()
    assert(viaCol.getAs[Double]("bc") ==
      CdfNumerics.betaCdf(rows.head._2, rows.head._3, rows.head._4))
  }
}
