package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Document quality scoring — the heuristic quality-gate stage of a
  * pretraining data pipeline (length, word-shape, and stopword-density
  * features composed into one [0,1] score; the published C4/Gopher-rule
  * family). q67's operator face, extracted in r13 so the SQL front door
  * (`graft_quality('docs')`) and the DataFrame face share ONE
  * implementation — the q67 oracle pins both.
  *
  * Scale shape: a pure per-document projection — no shuffle, no state;
  * at 100 TB this is a map-side pass fused into whatever scan feeds it.
  */
object Quality {

  /** Per-document features + composite score over (doc_id, text):
    * (doc_id, n_chars, n_words, avg_wlen, stop_ratio, short_ratio,
    * quality). Ratios round to 6 places and the score to 4 — the
    * engine-portable float discipline (the DuckDB oracle replays the
    * same arithmetic digit-for-digit).
    *
    * Zero-word contract: a document with no words gets EXPLICIT zero
    * ratios and quality 0.0 (a gate should reject empty documents, not
    * emit NULLs). Without the guard the div-by-zero NULL propagates
    * silently — Report's sum(quality) would skip the doc while n_docs
    * counts it, and keepBest would rank it by nulls-last accident.
    * QualitySpec pins the guard.
    */
  def score(docs: DataFrame): DataFrame = score(docs, Nil)

  /** [[score]] with passthrough doc columns (e.g. source, lang) riding
    * the projection — a consumer needing them pays no join and no
    * second scan (the scoredMicro carry convention).
    */
  def score(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val cs = carry.map(col)
    // the zero-word guard (n_words = 0 → 0.0, never a NULL ratio)
    def z(c: org.apache.spark.sql.Column) =
      when(size(col("w")) === 0, lit(0.0)).otherwise(c)
    val m = docs
      .select(Seq(col("doc_id")) ++ cs ++ Seq(Text.normText(col("text")).as("n"),
        Text.words(col("text")).as("w")): _*)
      .select(Seq(col("doc_id")) ++ cs ++ Seq(
        length(col("n")).as("n_chars"),
        size(col("w")).as("n_words"),
        z(round(length(regexp_replace(col("n"), " ", "")).cast("double")
          / size(col("w")), 6)).as("avg_wlen"),
        z(round(Text.vocabHits("w", Text.stopwords.head._2).cast("double")
          / size(col("w")), 6)).as("stop_ratio"),
        z(round(expr("size(filter(w, x -> length(x) < 3))").cast("double")
          / size(col("w")), 6)).as("short_ratio")): _*)
    // Composite in EXACT integer 1e-7 micro-units (r16; the q165/q207
    // discipline — caught by the sf10 spot-oracle: the float composite
    // 0.4·len + 0.3·sr + 0.3·(1−shr) rounded at 4 dp disagreed
    // cross-engine on 2 of 500k docs sitting exactly on a .xxxx5
    // boundary, where Spark's HALF_UP-on-expansion and DuckDB's
    // scaled-double rounding diverge). The 6-dp RATIOS are half-safe by
    // construction — a denominator ≤ 100 words cannot produce a 1e-6
    // half (it would need 2-adic valuation ≥ 7, i.e. den ≥ 128) — so
    // round(ratio·1e6) recovers their integer numerators exactly, and
    //   q·1e7 = min(n_words·20000, 4e6) + 3·sr6 + 3e6 − 3·shr6
    // is pure int64; half-up to 1e-4 via (2v+1000) div 2000 (positive
    // operands truncate identically on both engines), then /10000.0 —
    // a 4-dp decimal both engines represent as the same double.
    m.select(Seq(col("doc_id")) ++ cs ++ Seq(col("n_chars"), col("n_words"),
      col("avg_wlen"), col("stop_ratio"), col("short_ratio"),
      when(col("n_words") === 0, lit(0.0)).otherwise(expr(
        "cast((2 * (least(cast(n_words as bigint) * 20000, 4000000) " +
          "+ 3 * cast(round(stop_ratio * 1000000, 0) as bigint) + 3000000 " +
          "- 3 * cast(round(short_ratio * 1000000, 0) as bigint)) + 1000) " +
          "div 2000 as bigint) / 10000.0D")).as("quality")): _*)
  }
}
