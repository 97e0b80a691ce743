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

  test("large-shape parity: the iteration budget scales past the old flat cap") {
    // Near x ≈ a the series needs ~sqrt(69·a) terms, so shapes ≥ 3e4
    // overran a flat 500-iteration cap; the budget now scales with
    // sqrt(shape) and must agree with commons-math (which iterates to
    // convergence) instead of silently truncating.
    for (shape <- Seq(3.0e4, 5.0e4, 1.0e5); frac <- Seq(0.97, 1.0, 1.03)) {
      val v = shape * frac
      val want = org.apache.commons.math3.special.Gamma.regularizedGammaP(shape, v)
      val got = CdfNumerics.gammaCdf(shape, 1.0, v)
      assert(math.abs(got - want) <= 1e-10,
        s"gamma_cdf($shape, 1, $v): got $got want $want")
    }
    // randomized large shapes across the series/CF crossover
    for (_ <- 1 to 60) {
      val shape = 1.0e3 + rnd.nextDouble() * 9.9e4
      val v = shape * (0.9 + rnd.nextDouble() * 0.2)
      val want = org.apache.commons.math3.special.Gamma.regularizedGammaP(shape, v)
      assert(math.abs(CdfNumerics.gammaCdf(shape, 1.0, v) - want) <= 1e-10,
        s"gamma_cdf($shape, 1, $v)")
    }
    // large symmetric and asymmetric beta parameters at the symmetry point
    for ((a, b) <- Seq((2.0e4, 2.0e4), (5.0e4, 3.0e4), (1.0e5, 7.0e2))) {
      val x = a / (a + b)
      val want = org.apache.commons.math3.special.Beta.regularizedBeta(x, a, b)
      assert(math.abs(CdfNumerics.betaCdf(a, b, x) - want) <= 1e-10,
        s"beta_cdf($a, $b, $x)")
    }
    // the q171 pinned shape now converges within its budget (the old
    // flat cap exited at 500 of the ~580 needed iterations); the
    // residual vs commons-math is cross-Lanczos rounding, not
    // truncation, so the shared 1e-10 parity tolerance applies
    val pinned = CdfNumerics.gammaCdf(5000.0, 2.0, 10000.0)
    val cm = org.apache.commons.math3.special.Gamma.regularizedGammaP(5000.0, 5000.0)
    assert(math.abs(pinned - cm) <= 1e-10, s"shape-5000 pin: $pinned vs $cm")
  }

  test("pathological shapes fail in bounded time — the scaled budget has an absolute ceiling") {
    // r8 ADVICE: 10·sqrt(shape) with no ceiling buys a huge per-row
    // budget (1e9 iterations at shape 1e16 — an effective hang). The
    // ceiling (1e7) turns that into a fast ArithmeticException: at
    // shape 1e13 the series needs ~sqrt(69·a) ≈ 2.6e7 terms, over the
    // ceiling, so it must throw instead of burning the unclamped 3.2e7.
    val t0 = System.nanoTime()
    intercept[ArithmeticException] { CdfNumerics.gammaCdf(1.0e13, 1.0, 1.0e13) }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, f"pathological shape took $secs%.1f s — ceiling not effective")
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

  test("inverse beta/gamma parity with commons-math and exact round-trips") {
    for (_ <- 1 to 200) {
      val a = 0.1 + rnd.nextDouble() * 15.0
      val b = 0.1 + rnd.nextDouble() * 15.0
      val p = rnd.nextDouble()
      val got = CdfNumerics.inverseBetaCdf(a, b, p)
      // commons-math Brent converges to its 1e-9 default accuracy
      val want = new org.apache.commons.math3.distribution.BetaDistribution(null, a, b,
        org.apache.commons.math3.distribution.BetaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
        .inverseCumulativeProbability(p)
      assert(math.abs(got - want) <= 1e-7, s"inv_beta($a, $b, $p): got $got want $want")
      // the Newton root is ~1-ulp in x; in p-space that is density(x)
      // ulps — unbounded where an endpoint density diverges (a or b
      // < 1), so the tolerance is the representation limit itself
      val dens = math.exp((a - 1.0) * math.log(got.max(1e-300)) +
        (b - 1.0) * math.log1p(-(got.min(1.0 - 1e-16))) +
        CdfNumerics.logGamma(a + b) - CdfNumerics.logGamma(a) - CdfNumerics.logGamma(b))
      val tol = math.max(1e-12, 8.0 * dens * Math.ulp(got.max(1e-300)))
      assert(math.abs(CdfNumerics.betaCdf(a, b, got) - p) <= tol,
        s"beta round-trip at ($a, $b, $p)")
    }
    for (_ <- 1 to 200) {
      val shape = 0.1 + rnd.nextDouble() * 15.0
      val scale = 0.1 + rnd.nextDouble() * 10.0
      val p = rnd.nextDouble()
      val got = CdfNumerics.inverseGammaCdf(shape, scale, p)
      val cm = new org.apache.commons.math3.distribution.GammaDistribution(null, shape, scale,
        org.apache.commons.math3.distribution.GammaDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
        .inverseCumulativeProbability(p)
      assert(math.abs(got - cm) <= 1e-6 * (1.0 + math.abs(cm)),
        s"inv_gamma($shape, $scale, $p): got $got want $cm")
      val y = got / scale
      val dens = math.exp((shape - 1.0) * math.log(y.max(1e-300)) - y -
        CdfNumerics.logGamma(shape)) / scale
      val tol = math.max(1e-12, 8.0 * dens * Math.ulp(got.max(1e-300)))
      assert(math.abs(CdfNumerics.gammaCdf(shape, scale, got) - p) <= tol,
        s"gamma round-trip at ($shape, $scale, $p)")
    }
    // endpoints follow the reference's delegate: support bounds
    assert(CdfNumerics.inverseBetaCdf(2.5, 1.5, 0.0) == 0.0)
    assert(CdfNumerics.inverseBetaCdf(2.5, 1.5, 1.0) == 1.0)
    assert(CdfNumerics.inverseGammaCdf(2.5, 1.5, 0.0) == 0.0)
    assert(CdfNumerics.inverseGammaCdf(2.5, 1.5, 1.0).isPosInfinity)
  }

  test("composed chi-squared and F faces match their defining identities") {
    val sqls = spark.sql(
      """SELECT graft_chi_squared_cdf(3.0, 2.41) AS c1,
        |  graft_inverse_chi_squared_cdf(3.0, 0.37) AS ic1,
        |  graft_f_cdf(5.0, 7.0, 1.3) AS f1,
        |  graft_inverse_f_cdf(5.0, 7.0, 0.42) AS if1""".stripMargin).head()
    assert(sqls.getAs[Double]("c1") == CdfNumerics.gammaCdf(1.5, 2.0, 2.41))
    assert(sqls.getAs[Double]("ic1") == CdfNumerics.inverseGammaCdf(1.5, 2.0, 0.37))
    val d1 = 5.0; val d2 = 7.0; val x = 1.3
    assert(sqls.getAs[Double]("f1") ==
      CdfNumerics.betaCdf(d1 / 2, d2 / 2, d1 * x / (d1 * x + d2)))
    // F inverse round-trips through the F cdf identity
    val xf = sqls.getAs[Double]("if1")
    assert(math.abs(CdfNumerics.betaCdf(d1 / 2, d2 / 2, d1 * xf / (d1 * xf + d2)) - 0.42) < 1e-12)
    // and matches commons-math's FDistribution inverse
    val cm = new org.apache.commons.math3.distribution.FDistribution(null, d1, d2,
      org.apache.commons.math3.distribution.FDistribution.DEFAULT_INVERSE_ABSOLUTE_ACCURACY)
      .inverseCumulativeProbability(0.42)
    assert(math.abs(xf - cm) <= 1e-6 * (1.0 + cm), s"inv_f: $xf vs $cm")
  }

  test("domain errors throw the reference's contract") {
    intercept[IllegalArgumentException](CdfNumerics.betaCdf(0.0, 3.0, 0.5))
    intercept[IllegalArgumentException](CdfNumerics.betaCdf(3.0, 0.0, 0.5))
    intercept[IllegalArgumentException](CdfNumerics.betaCdf(3.0, 3.0, 1.5))
    intercept[IllegalArgumentException](CdfNumerics.gammaCdf(0.0, 1.0, 1.0))
    intercept[IllegalArgumentException](CdfNumerics.gammaCdf(1.0, 0.0, 1.0))
    intercept[IllegalArgumentException](CdfNumerics.gammaCdf(1.0, 1.0, -0.1))
  }

  test("chi²/F faces throw the reference's own message text, not the kernels'") {
    // MathFunctions.java:845-893 verbatim (r7 ADVICE)
    def msg(t: => Any): String = intercept[IllegalArgumentException](t).getMessage
    assert(msg(CdfNumerics.chiSquaredCdf(0.0, 1.0)) == "df must be greater than 0")
    assert(msg(CdfNumerics.chiSquaredCdf(3.0, -0.5)) == "value must non-negative")
    assert(msg(CdfNumerics.inverseChiSquaredCdf(0.0, 0.5)) == "df must be greater than 0")
    assert(msg(CdfNumerics.inverseChiSquaredCdf(3.0, 1.5)) == "p must be in the interval [0, 1]")
    assert(msg(CdfNumerics.fCdf(0.0, 7.0, 1.0)) == "numerator df must be greater than 0")
    assert(msg(CdfNumerics.fCdf(5.0, 0.0, 1.0)) == "denominator df must be greater than 0")
    assert(msg(CdfNumerics.fCdf(5.0, 7.0, -1.0)) == "value must non-negative")
    assert(msg(CdfNumerics.inverseFCdf(0.0, 7.0, 0.5)) == "numerator df must be greater than 0")
    assert(msg(CdfNumerics.inverseFCdf(5.0, 0.0, 0.5)) == "denominator df must be greater than 0")
    assert(msg(CdfNumerics.inverseFCdf(5.0, 7.0, -0.1)) == "p must be in the interval [0, 1]")
    // the value check precedes the df check, as in the reference
    assert(msg(CdfNumerics.chiSquaredCdf(0.0, -1.0)) == "value must non-negative")
    // and the SQL faces surface the same messages through codegen
    val e = intercept[Exception](
      spark.sql("SELECT graft_chi_squared_cdf(0.0, 1.0)").head())
    assert(e.getMessage.contains("df must be greater than 0") ||
      Option(e.getCause).exists(_.getMessage.contains("df must be greater than 0")))
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
