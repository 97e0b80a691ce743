package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix construction — hit per-language TARGET token shares
  * from an arbitrary corpus distribution with a deterministic,
  * engine-replayable hash draw (the data-mixing stage of published
  * pre-training recipes; q152's operator, extracted so the SELECTION
  * composes: q190 feeds the kept set straight into the shard packer).
  *
  * Scale shape: token counting is a map-side projection; availability
  * is ONE stratum-cardinality-sized aggregation broadcast back; the
  * keep decision is a map-side filter in exact integer arithmetic
  * (the q145 threshold form — no float at the boundary). The only
  * corpus-sized cost at 100 TB is the scan.
  */
object Mix {

  /** q152's target shares (percent of the token budget per language). */
  val defaultShares: Column =
    expr("CASE lang WHEN 'en' THEN 40 WHEN 'zh' THEN 25 WHEN 'de' THEN 20 " +
      "WHEN 'es' THEN 10 ELSE 5 END")

  /** Corpus-thin (doc_id, lang, toks, h): whitespace token counts plus
    * the content-independent md5 sampling draw (q127's discipline —
    * reproducible under reprocessing; corpus growth never flips an old
    * document's draw).
    */
  def counted(docs: DataFrame, salt: String = "mix|"): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      expr("cast(size(split(trim(text), '\\\\s+')) as bigint)").as("toks"),
      // lit(salt), not string interpolation into an expr: a caller-
      // supplied salt containing a quote/backslash must hash as-is,
      // never re-parse as SQL
      conv(substring(md5(concat(lit(salt), col("doc_id").cast("string"))), 1, 15),
        16, 10).cast("long").as("h"))

  /** Per-language (lang, avail, want): availability from one
    * stratum-sized aggregation; want = budget·share/100 exact-integer.
    */
  def availability(cnt: DataFrame, budgetTokens: Long,
                   shares: Column = defaultShares): DataFrame =
    cnt.groupBy(col("lang"))
      .agg(sum(col("toks")).as("avail"))
      .withColumn("share_pct", shares)
      .withColumn("want", expr(s"${budgetTokens}L * share_pct div 100"))
      .select(col("lang"), col("avail"), col("want"))

  /** Keep rate min(1, want/avail) decided as
    * h < (2⁶⁰ div avail)·want on the 60-bit md5 draw — integer-exact,
    * so the keep boundary can never move with float representation.
    */
  private def keepPredicate: Column =
    col("want") >= col("avail") ||
      col("h") < expr("1152921504606846976L div avail") * col("want")

  /** Documents kept under the exact-integer keep rule. Availability
    * broadcasts; the filter is map-side. Returns the thin kept table
    * (doc_id, lang, toks, h, avail, want).
    */
  def keep(docs: DataFrame, budgetTokens: Long,
           shares: Column = defaultShares, salt: String = "mix|"): DataFrame = {
    val cnt = counted(docs, salt)
    cnt.join(broadcast(availability(cnt, budgetTokens, shares)), "lang")
      .where(keepPredicate)
  }

  /** Per-batch keep decision against a FIXED availability table — the
    * streaming deployment face (the q189 learnThreshold posture:
    * calibrate availability ONCE on the corpus or a sample, then gate
    * every arriving micro-batch at the same exact-integer rates). The
    * per-document draw is content- and batch-independent, so with the
    * same calibrated table the streamed keep set equals the batch
    * [[keep]] set exactly, regardless of how arrivals split into
    * batches (StreamingMixSpec pins it). A batch language ABSENT from
    * the calibrated table fails loudly — an inner join would silently
    * drop those documents and under-build the corpus (the
    * miscalibrated-sample hazard), and this repo's contract is loud
    * failure over silent data loss.
    */
  def keepAgainst(batch: DataFrame, avail: DataFrame,
                  salt: String = "mix|"): DataFrame =
    counted(batch, salt).join(broadcast(avail), Seq("lang"), "left")
      // assert_true returns null when it passes, so the isNull filter
      // keeps every calibrated row and THROWS on an uncalibrated one
      // (a projected-then-dropped assertion column would be pruned)
      .filter(assert_true(col("avail").isNotNull,
        concat(lit("Mix.keepAgainst: language '"), col("lang"),
          lit("' is missing from the calibrated availability table — " +
            "recalibrate on a sample covering every arriving language"))).isNull)
      .where(keepPredicate)

  /** q152's achieved-vs-wanted-vs-available mix report. */
  def report(docs: DataFrame, budgetTokens: Long,
             shares: Column = defaultShares, salt: String = "mix|"): DataFrame =
    keep(docs, budgetTokens, shares, salt)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs_kept"),
        sum(col("toks")).as("tokens_kept"),
        max(col("want")).as("tokens_wanted"),
        max(col("avail")).as("tokens_available"))

  /** Dyadic-α exponent discipline: α is SNAPPED to k/2²⁰ (documented
    * contract; |Δα| ≤ 2⁻²¹ shifts share_ppm by well under one ppm unit
    * at corpus scales) and avail^(k/2²⁰) is computed as the product of
    * nested square roots — one factor sqrt^(20−j)(avail) per set bit j
    * of k, multiplied left-to-right from the SHALLOWEST factor. Every
    * step (sqrt, ×) is IEEE-754 correctly rounded on every conforming
    * engine, so the chain is bit-identical across Spark and the DuckDB
    * oracle — unlike libm pow, whose cross-engine ULP could flip the
    * floor-quantization boundary. α = 0.5 degenerates to the single
    * sqrt (k = 2¹⁹), α = 1 to exact integer identity.
    */
  val DyadicBits = 20

  def dyadicK(alpha: Double): Int = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val k = math.round(alpha * (1 << DyadicBits)).toInt
    require(k >= 1, s"alpha $alpha snaps below 1/2^$DyadicBits")
    k
  }

  /** Sqrt-nesting depths of the chain's factors, shallowest first —
    * the ONE canonical order both engines multiply in. k = 2²⁰ (α = 1)
    * has no in-range bits — callers take the exact integer identity
    * path instead; a direct chain call fails loudly rather than with
    * an opaque empty-reduce error.
    */
  private def chainDepths(k: Int): Seq[Int] = {
    require(k >= 1 && k < (1 << DyadicBits),
      s"dyadic chain needs 1 <= k < 2^$DyadicBits (k = 2^$DyadicBits is " +
        s"the exact identity path), got $k")
    (0 until DyadicBits).filter(j => ((k >> j) & 1) == 1)
      .map(j => DyadicBits - j).sorted
  }

  /** The Spark face of the chain: x^(k/2²⁰) for x a non-negative
    * double column. Exact for k = 2²⁰ handled by the caller.
    */
  def dyadicPow(x: Column, k: Int): Column =
    chainDepths(k).map(d => (1 to d).foldLeft(x)((c, _) => sqrt(c)))
      .reduceLeft(_ * _)

  /** The identical chain as DuckDB SQL text (for oracle authors) —
    * same factor order, same left-associated multiplication.
    */
  def dyadicPowSql(xExpr: String, k: Int): String =
    chainDepths(k).map(d => "sqrt(" * d + xExpr + ")" * d).mkString(" * ")

  /** TEMPERATURE-scaled availability shares — the multilingual
    * α-sampling recipe (UniMax / mT5-style, Chung et al. 2023; Xue et
    * al. 2021 §3.1): instead of hand-fixed target percentages, each
    * language's share of the budget is proportional to avail^α, which
    * up-weights low-resource languages as α falls below 1 (α = 1 is
    * proportional sampling, α → 0 uniform). Returns (lang, avail,
    * share_ppm, want) with share_ppm the language's integer
    * parts-per-1e5 share of the budget.
    *
    * Determinism discipline: avail^α is quantized ONCE per language to
    * integer micro-units, floor(avail^α · 10⁶) — L evaluations per
    * corpus — and everything downstream is exact int64: share_ppm =
    * w·10⁵ div Σw, want = budget·share_ppm div 10⁵. The exponent runs
    * through the [[dyadicPow]] sqrt-chain (α snapped to k/2²⁰), so
    * EVERY α is engine-exact and rides the full hash-matched oracle
    * (q193 at α = 0.5, q201 at α = 0.3/0.7) — r13's libm-pow escape
    * hatch is gone. α = 1 takes the exact integer path (avail·10⁶ in
    * DECIMAL — no double rounding past 2⁵³).
    *
    * Overflow discipline: the two-step ppm form bounds intermediates,
    * and the two products AND wsum run in DECIMAL(38,0) (HUGEINT in
    * the oracle) because w reaches 10⁶·avail at α = 1 — w·10⁵ would
    * wrap int64 at ~9·10⁷ tokens in one language. Integral division on
    * the widened type truncates identically on both engines; share_ppm
    * and want land back in int64 by construction (≤ 10⁵ and ≤ budget).
    */
  def availabilityTemperature(cnt: DataFrame, budgetTokens: Long,
                              alpha: Double = 0.5): DataFrame = {
    val k = dyadicK(alpha)
    val av = cnt.groupBy(col("lang")).agg(sum(col("toks")).as("avail"))
      .withColumn("w", if (k == (1 << DyadicBits))
        expr("cast(avail as decimal(38,0)) * 1000000")
      else floor(dyadicPow(col("avail").cast("double"), k) * 1e6).cast("long"))
      // stratum-cardinality-sized: materialize the fit ONCE (the q190
      // fit-at-construction posture) so the total side and the share
      // join below read L materialized rows instead of re-deriving the
      // corpus aggregation — without this the corpus is scanned three
      // times (fit, total, sampling) instead of twice
      .localCheckpoint(true)
    // single-row total side (the q136/q140/q165 broadcast idiom).
    // wsum is summed in the WIDENED type too: w reaches 1e6·avail at
    // α = 1, so a plain long sum wraps silently past ~9.2e12 corpus
    // tokens (non-ANSI) while the oracle promotes sum(BIGINT) to
    // HUGEINT — the widened sum keeps both engines exact at 100 TB.
    val tot = av.agg(sum(col("w").cast("decimal(38,0)")).as("wsum"))
    av.crossJoin(broadcast(tot))
      // widened to DECIMAL(38,0) (DuckDB: HUGEINT): w can reach 1e6·avail
      // at alpha = 1, so w·10⁵ overflows int64 at ~9e7 TOKENS in one
      // language — far below real corpora. Integral division on the
      // widened type truncates identically on both engines; the results
      // are bit-identical to the int64 form wherever that form didn't
      // overflow, and correct (not wrapped-negative) where it did.
      .withColumn("share_ppm",
        expr("cast(w as decimal(38,0)) * 100000 div wsum"))
      .withColumn("want",
        expr(s"cast(${budgetTokens}L as decimal(38,0)) * share_ppm div 100000"))
      .select(col("lang"), col("avail"), col("share_ppm"), col("want"))
  }

  /** Documents kept under temperature-scaled shares — [[keep]] with
    * [[availabilityTemperature]] in place of fixed target percentages.
    * Same exact-integer keep boundary; the want > avail case (a
    * low-resource language boosted past its availability) caps the
    * rate at 1, exactly as fixed-share mixing does.
    */
  def keepTemperature(docs: DataFrame, budgetTokens: Long,
                      alpha: Double = 0.5, salt: String = "mix|"): DataFrame = {
    val cnt = counted(docs, salt)
    cnt.join(broadcast(availabilityTemperature(cnt, budgetTokens, alpha)), "lang")
      .where(keepPredicate)
  }

  /** [[report]] under temperature-scaled shares, with the learned
    * integer share attached per language.
    */
  def reportTemperature(docs: DataFrame, budgetTokens: Long,
                        alpha: Double = 0.5, salt: String = "mix|"): DataFrame =
    keepTemperature(docs, budgetTokens, alpha, salt)
      .groupBy(col("lang"))
      .agg(max(col("share_ppm")).as("share_ppm"),
        count(lit(1)).as("docs_kept"),
        sum(col("toks")).as("tokens_kept"),
        max(col("want")).as("tokens_wanted"),
        max(col("avail")).as("tokens_available"))
}
