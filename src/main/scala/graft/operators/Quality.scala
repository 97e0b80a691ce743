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
    m.select(Seq(col("doc_id")) ++ cs ++ Seq(col("n_chars"), col("n_words"),
      col("avg_wlen"), col("stop_ratio"), col("short_ratio"),
      when(col("n_words") === 0, lit(0.0)).otherwise(
        round(lit(0.4) * least(col("n_words") / 200.0, lit(1.0))
          + lit(0.3) * col("stop_ratio")
          + lit(0.3) * (lit(1.0) - col("short_ratio")), 4)).as("quality")): _*)
  }
}
