package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Real-parameter probability CDFs matching the reference's general
  * beta_cdf / gamma_cdf surface (reference
  * presto-main/.../scalar/MathFunctions.java:803 betaCdf, :916 gammaCdf
  * — both delegate to commons-math distributions, i.e. the regularized
  * incomplete beta/gamma). q149 covers the integer-shape subset with
  * finite-sum formulas replayable in SQL; these expressions close the
  * general real-parameter forms with the published numerics the
  * commons-math implementations themselves use: Lanczos log-gamma, the
  * incomplete-gamma series, and modified-Lentz continued fractions
  * (Numerical Recipes §6.1-6.4 / DLMF 8.9, 8.17 — public algorithms).
  *
  * Accuracy: the series/CF iterate to 1e-15 relative; Lanczos (g=7,
  * n=9 public coefficient set) carries ~1e-13 relative — spec-checked
  * against commons-math (the reference's own delegate, present in
  * Spark's jars) at 1e-10 and against closed forms where they exist.
  *
  * Domain errors throw IllegalArgumentException with the reference's
  * message text (checkCondition → INVALID_FUNCTION_ARGUMENT there).
  *
  * Per-row scalar kernels: codegen'd static calls inside
  * WholeStageCodegen, no interpreted path in the hot loop.
  */
object CdfNumerics {
  private final val Eps = 1e-15
  private final val FpMin = java.lang.Double.MIN_NORMAL / Eps

  // Iteration budget scaled to the shape parameter: near the
  // series/CF crossover x ≈ a both expansions need O(sqrt(a))
  // terms (the slowest decay is ~e^{-n²/2a}), so a flat cap
  // silently truncates for large shapes. 10·sqrt(a) leaves a
  // comfortable margin over the ~sqrt(69·a) worst case observed
  // at the 1e-15 tolerance; non-convergence within the scaled
  // budget throws rather than returning a truncated sum, matching
  // commons-math's MaxCountExceededException behavior.
  // … with an ABSOLUTE ceiling (r8 ADVICE): a corrupt row carrying a
  // pathological shape (chi² df ~1e16 scales the budget to ~1e9) must
  // fail with the non-convergence ArithmeticException in bounded time,
  // not hang per-row. 1e7 (≈ tens of ms) covers every shape up to
  // ~1.4e12 — 10× the budget any sane shape (a ≤ 1e10) requests —
  // and beyond that throws fast instead of spinning.
  private final val MaxIterCeiling = 10000000L
  private def maxIter(a: Double): Int =
    math.max(500L, math.ceil(10.0 * math.sqrt(a)).toLong).min(MaxIterCeiling).toInt

  // Lanczos approximation, g=7 n=9 public coefficient set
  private final val LanczosG = 7.0
  private final val Lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** ln Γ(x) for x > 0. */
  def logGamma(x: Double): Double = {
    val z = x - 1.0
    var sum = Lanczos(0)
    var i = 1
    while (i < Lanczos.length) { sum += Lanczos(i) / (z + i); i += 1 }
    val t = z + LanczosG + 0.5
    0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(sum)
  }

  /** Regularized lower incomplete gamma P(a, x), a > 0, x ≥ 0. */
  def regGammaP(a: Double, x: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x < a + 1.0) gammaSeries(a, x)
    else 1.0 - gammaCf(a, x)
  }

  // series: P(a,x) = e^{-x} x^a / Γ(a) · Σ_n x^n / (a(a+1)…(a+n))
  private def gammaSeries(a: Double, x: Double): Double = {
    val cap = maxIter(a)
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var i = 0
    while (i < cap && math.abs(del) >= math.abs(sum) * Eps) {
      ap += 1.0
      del *= x / ap
      sum += del
      i += 1
    }
    if (i >= cap && math.abs(del) >= math.abs(sum) * Eps)
      throw new ArithmeticException(
        s"incomplete gamma series failed to converge for a=$a, x=$x after $cap iterations")
    sum * math.exp(-x + a * math.log(x) - logGamma(a))
  }

  // modified-Lentz continued fraction for Q(a,x), x ≥ a+1
  private def gammaCf(a: Double, x: Double): Double = {
    val cap = maxIter(a)
    var b = x + 1.0 - a
    var c = 1.0 / FpMin
    var d = 1.0 / b
    var h = d
    var i = 1
    var del = 0.0
    do {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b
      if (math.abs(d) < FpMin) d = FpMin
      c = b + an / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      del = d * c
      h *= del
      i += 1
    } while (i < cap && math.abs(del - 1.0) >= Eps)
    if (i >= cap && math.abs(del - 1.0) >= Eps)
      throw new ArithmeticException(
        s"incomplete gamma continued fraction failed to converge for a=$a, x=$x after $cap iterations")
    math.exp(-x + a * math.log(x) - logGamma(a)) * h
  }

  /** Regularized incomplete beta I_x(a, b), a,b > 0, x ∈ [0,1]. */
  def regBeta(x: Double, a: Double, b: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val bt = math.exp(logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log(1.0 - x))
      // the CF converges fast only below the symmetry point — use the
      // reflection I_x(a,b) = 1 − I_{1−x}(b,a) on the other side
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betaCf(x, a, b) / a
      else 1.0 - bt * betaCf(1.0 - x, b, a) / b
    }
  }

  // modified-Lentz continued fraction for the incomplete beta.
  // Budget scales with a+b: convergence slows near the symmetry
  // point x ≈ a/(a+b) at the same O(sqrt(·)) rate as the gamma CF.
  private def betaCf(x: Double, a: Double, b: Double): Double = {
    val cap = maxIter(a + b)
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var del = 0.0
    do {
      val m2 = 2 * m
      // even step
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      // odd step
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      del = d * c
      h *= del
      m += 1
    } while (m < cap && math.abs(del - 1.0) >= Eps)
    if (m >= cap && math.abs(del - 1.0) >= Eps)
      throw new ArithmeticException(
        s"incomplete beta continued fraction failed to converge for a=$a, b=$b, x=$x after $cap iterations")
    h
  }

  /** Safeguarded Newton inverse of a monotone-increasing CDF on
    * (lo, hi): Newton steps off the analytic density, falling back to
    * bisection whenever a step leaves the current bracket (the
    * standard rtsafe construction, Numerical Recipes §9.4). Converges
    * to ~1 ulp of the root — tighter than the reference's delegate
    * (commons-math Brent at its 1e-9 default accuracy), which the
    * parity spec accounts for.
    */
  private def invMonotone(f: Double => Double, pdf: Double => Double,
      lo0: Double, hi0: Double, x0: Double): Double = {
    var lo = lo0
    var hi = hi0
    var x = x0
    var i = 0
    while (i < 200) {
      val fx = f(x)
      if (fx == 0.0) return x
      if (fx > 0.0) hi = x else lo = x
      val d = pdf(x)
      var nx = if (d > 0.0) x - fx / d else Double.NaN
      if (!(nx > lo && nx < hi)) nx = 0.5 * (lo + hi)
      if (nx == x) return x
      if (math.abs(nx - x) <= 4.0 * Math.ulp(x)) return nx
      x = nx
      i += 1
    }
    x
  }

  private def logBeta(a: Double, b: Double): Double =
    logGamma(a) + logGamma(b) - logGamma(a + b)

  /** Inverse of I_x(a, b) in x for p ∈ [0, 1]. */
  def invRegBeta(a: Double, b: Double, p: Double): Double = {
    if (p <= 0.0) 0.0
    else if (p >= 1.0) 1.0
    else {
      val lnB = logBeta(a, b)
      invMonotone(
        x => regBeta(x, a, b) - p,
        x => math.exp((a - 1.0) * math.log(x) + (b - 1.0) * math.log1p(-x) - lnB),
        0.0, 1.0, a / (a + b))
    }
  }

  /** Inverse of P(a, y) in y for p ∈ [0, 1). */
  def invRegGammaP(a: Double, p: Double): Double = {
    if (p <= 0.0) 0.0
    else {
      // bracket: the mean a always has P(a, a) ∈ (0.4, 0.7); double
      // outward until the root is enclosed
      var hi = math.max(a, 1.0)
      while (regGammaP(a, hi) <= p) hi *= 2.0
      val lg = logGamma(a)
      invMonotone(
        y => regGammaP(a, y) - p,
        y => math.exp((a - 1.0) * math.log(y) - y - lg),
        0.0, hi, math.min(a, 0.5 * hi))
    }
  }

  /** beta_cdf(a, b, value) with the reference's domain contract. */
  def betaCdf(a: Double, b: Double, value: Double): Double = {
    if (!(value >= 0.0 && value <= 1.0))
      throw new IllegalArgumentException("value must be in the interval [0, 1]")
    if (!(a > 0.0)) throw new IllegalArgumentException("a must be > 0")
    if (!(b > 0.0)) throw new IllegalArgumentException("b must be > 0")
    regBeta(value, a, b)
  }

  /** gamma_cdf(shape, scale, value) with the reference's domain contract. */
  def gammaCdf(shape: Double, scale: Double, value: Double): Double = {
    if (!(value >= 0.0))
      throw new IllegalArgumentException("value must be greater than, or equal to, 0")
    if (!(shape > 0.0)) throw new IllegalArgumentException("shape must be greater than 0")
    if (!(scale > 0.0)) throw new IllegalArgumentException("scale must be greater than 0")
    regGammaP(shape, value / scale)
  }

  /** inverse_beta_cdf(a, b, p) — reference MathFunctions.java:788. */
  def inverseBetaCdf(a: Double, b: Double, p: Double): Double = {
    if (!(p >= 0.0 && p <= 1.0))
      throw new IllegalArgumentException("p must be in the interval [0, 1]")
    if (!(a > 0.0)) throw new IllegalArgumentException("a must be > 0")
    if (!(b > 0.0)) throw new IllegalArgumentException("b must be > 0")
    invRegBeta(a, b, p)
  }

  /** inverse_gamma_cdf(shape, scale, p) — reference MathFunctions.java:901.
    * p = 1 returns +∞ (the distribution's support bound, as the
    * reference's commons-math delegate does).
    */
  def inverseGammaCdf(shape: Double, scale: Double, p: Double): Double = {
    if (!(p >= 0.0 && p <= 1.0))
      throw new IllegalArgumentException("p must be in the interval [0, 1]")
    if (!(shape > 0.0)) throw new IllegalArgumentException("shape must be greater than 0")
    if (!(scale > 0.0)) throw new IllegalArgumentException("scale must be greater than 0")
    if (p == 1.0) Double.PositiveInfinity
    else scale * invRegGammaP(shape, p)
  }

  // The chi²/F faces validate their OWN parameter names before
  // delegating to the gamma/beta kernels, so the thrown message text
  // matches the reference exactly ("df"/"numerator df"/"denominator
  // df", and the reference's verbatim "value must non-negative" —
  // MathFunctions.java:850-893). The delegation itself cannot throw:
  // df > 0 ⇒ shape > 0, and value ≥ 0 ⇒ the beta argument ∈ [0, 1).

  /** chi_squared_cdf(df, value) — reference MathFunctions.java:858. */
  def chiSquaredCdf(df: Double, value: Double): Double = {
    if (!(value >= 0.0)) throw new IllegalArgumentException("value must non-negative")
    if (!(df > 0.0)) throw new IllegalArgumentException("df must be greater than 0")
    regGammaP(df / 2.0, value / 2.0)
  }

  /** inverse_chi_squared_cdf(df, p) — reference MathFunctions.java:845. */
  def inverseChiSquaredCdf(df: Double, p: Double): Double = {
    if (!(p >= 0.0 && p <= 1.0))
      throw new IllegalArgumentException("p must be in the interval [0, 1]")
    if (!(df > 0.0)) throw new IllegalArgumentException("df must be greater than 0")
    if (p == 1.0) Double.PositiveInfinity
    else 2.0 * invRegGammaP(df / 2.0, p)
  }

  /** f_cdf(df1, df2, value) — reference MathFunctions.java:884. */
  def fCdf(df1: Double, df2: Double, value: Double): Double = {
    if (!(value >= 0.0)) throw new IllegalArgumentException("value must non-negative")
    if (!(df1 > 0.0)) throw new IllegalArgumentException("numerator df must be greater than 0")
    if (!(df2 > 0.0)) throw new IllegalArgumentException("denominator df must be greater than 0")
    regBeta(df1 * value / (df1 * value + df2), df1 / 2.0, df2 / 2.0)
  }

  /** inverse_f_cdf(df1, df2, p) — reference MathFunctions.java:871. */
  def inverseFCdf(df1: Double, df2: Double, p: Double): Double = {
    if (!(p >= 0.0 && p <= 1.0))
      throw new IllegalArgumentException("p must be in the interval [0, 1]")
    if (!(df1 > 0.0)) throw new IllegalArgumentException("numerator df must be greater than 0")
    if (!(df2 > 0.0)) throw new IllegalArgumentException("denominator df must be greater than 0")
    val y = invRegBeta(df1 / 2.0, df2 / 2.0, p)
    if (y >= 1.0) Double.PositiveInfinity
    else df2 * y / (df1 * (1.0 - y))
  }
}

private[plans] trait CdfBinary
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two double arguments, got " +
        children.map(_.dataType).mkString(", "))
}

/** graft_chi_squared_cdf(df, value) = P(df/2, value/2), with the
  * reference's own df/value domain messages (MathFunctions.java:858).
  */
case class ChiSquaredCdfExpr(left: Expression, right: Expression) extends CdfBinary {
  override def prettyName: String = "graft_chi_squared_cdf"

  override protected def nullSafeEval(df: Any, v: Any): Any =
    CdfNumerics.chiSquaredCdf(df.asInstanceOf[Double], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, v) => s"graft.plans.CdfNumerics.chiSquaredCdf($d, $v)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ChiSquaredCdfExpr = copy(l, r)
}

/** graft_inverse_chi_squared_cdf(df, p) (MathFunctions.java:845). */
case class InverseChiSquaredCdfExpr(left: Expression, right: Expression) extends CdfBinary {
  override def prettyName: String = "graft_inverse_chi_squared_cdf"

  override protected def nullSafeEval(df: Any, p: Any): Any =
    CdfNumerics.inverseChiSquaredCdf(df.asInstanceOf[Double], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, p) => s"graft.plans.CdfNumerics.inverseChiSquaredCdf($d, $p)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): InverseChiSquaredCdfExpr = copy(l, r)
}

/** graft_f_cdf(df1, df2, value) = I_{df1·v/(df1·v+df2)}(df1/2, df2/2)
  * (MathFunctions.java:884).
  */
case class FCdfExpr(first: Expression, second: Expression, third: Expression)
    extends CdfTernary {
  override def prettyName: String = "graft_f_cdf"

  override protected def nullSafeEval(d1: Any, d2: Any, v: Any): Any =
    CdfNumerics.fCdf(d1.asInstanceOf[Double], d2.asInstanceOf[Double],
      v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, v) => s"graft.plans.CdfNumerics.fCdf($a, $b, $v)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FCdfExpr = copy(f, s, t)
}

/** graft_inverse_f_cdf(df1, df2, p) (MathFunctions.java:871). */
case class InverseFCdfExpr(first: Expression, second: Expression, third: Expression)
    extends CdfTernary {
  override def prettyName: String = "graft_inverse_f_cdf"

  override protected def nullSafeEval(d1: Any, d2: Any, p: Any): Any =
    CdfNumerics.inverseFCdf(d1.asInstanceOf[Double], d2.asInstanceOf[Double],
      p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, p) => s"graft.plans.CdfNumerics.inverseFCdf($a, $b, $p)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): InverseFCdfExpr = copy(f, s, t)
}

private[plans] trait CdfTernary extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three double arguments, got " +
        children.map(_.dataType).mkString(", "))
}

/** graft_beta_cdf(a, b, value) — regularized incomplete beta I_value(a, b). */
case class BetaCdfExpr(first: Expression, second: Expression, third: Expression)
    extends CdfTernary {
  override def prettyName: String = "graft_beta_cdf"

  override protected def nullSafeEval(a: Any, b: Any, v: Any): Any =
    CdfNumerics.betaCdf(a.asInstanceOf[Double], b.asInstanceOf[Double],
      v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, v) => s"graft.plans.CdfNumerics.betaCdf($a, $b, $v)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BetaCdfExpr = copy(f, s, t)
}

/** graft_gamma_cdf(shape, scale, value) — P(shape, value/scale). */
case class GammaCdfExpr(first: Expression, second: Expression, third: Expression)
    extends CdfTernary {
  override def prettyName: String = "graft_gamma_cdf"

  override protected def nullSafeEval(sh: Any, sc: Any, v: Any): Any =
    CdfNumerics.gammaCdf(sh.asInstanceOf[Double], sc.asInstanceOf[Double],
      v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, c, v) => s"graft.plans.CdfNumerics.gammaCdf($s, $c, $v)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GammaCdfExpr = copy(f, s, t)
}

/** graft_inverse_beta_cdf(a, b, p) — x with I_x(a, b) = p. */
case class InverseBetaCdfExpr(first: Expression, second: Expression, third: Expression)
    extends CdfTernary {
  override def prettyName: String = "graft_inverse_beta_cdf"

  override protected def nullSafeEval(a: Any, b: Any, p: Any): Any =
    CdfNumerics.inverseBetaCdf(a.asInstanceOf[Double], b.asInstanceOf[Double],
      p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, p) => s"graft.plans.CdfNumerics.inverseBetaCdf($a, $b, $p)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): InverseBetaCdfExpr = copy(f, s, t)
}

/** graft_inverse_gamma_cdf(shape, scale, p) — v with P(shape, v/scale) = p. */
case class InverseGammaCdfExpr(first: Expression, second: Expression, third: Expression)
    extends CdfTernary {
  override def prettyName: String = "graft_inverse_gamma_cdf"

  override protected def nullSafeEval(sh: Any, sc: Any, p: Any): Any =
    CdfNumerics.inverseGammaCdf(sh.asInstanceOf[Double], sc.asInstanceOf[Double],
      p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, c, p) => s"graft.plans.CdfNumerics.inverseGammaCdf($s, $c, $p)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): InverseGammaCdfExpr = copy(f, s, t)
}
