package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents that look like a target
  * distribution by scoring each document under a hashed n-gram bag
  * model, importance weight = log p_target(doc) − log p_raw(doc).
  * This is the model-based counterpart to hand-written quality gates
  * (q67) and the corpus-statistical LM filter (q165): the target is
  * DEFINED BY EXAMPLE (a subset of documents), not by rules.
  *
  * Determinism discipline (the q165 contract): features are hashed
  * with the SQL-replayable md5-60 family (graft.plans.Md5Hash60 —
  * DuckDB replays `('0x' || substr(md5(x), 1, 15))::BIGINT % B`), the
  * two add-one-smoothed log-probabilities are quantized ONCE per
  * bucket to integer micro-units (≤ 2·B ln calls per corpus, never
  * per token), and every per-document quantity after that is exact
  * int64 arithmetic — both engines rank on identical integers.
  *
  * Scale shape: one corpus scan explodes (doc, bucket) occurrences
  * (8-byte buckets, no feature strings through any shuffle); bucket
  * counts are a B-sized aggregation (map-side combined); the
  * log-ratio table is B rows — broadcast back; per-doc scores are one
  * doc_id-keyed sum with map-side combine; selection is top-k by
  * score, which plans as TakeOrderedAndProject (per-partition top-k +
  * a k-sized merge — never a global sort). At 100 TB the only
  * corpus-sized cost is ONE scan + one narrow shuffle of
  * (doc_id, int64) partial sums: [[importanceTopK]] materializes the
  * occurrence projection eagerly (catalog-managed persist, so the
  * clearCache-between-queries hygiene releases it) and both consumers
  * — the ratio fit and the scoring pass — read that one
  * materialization instead of re-deriving it from the corpus (the r9
  * shape rescanned three times). The other deployment posture, fit on
  * a sample then select over a different/full corpus, is the explicit
  * [[ratioTable]] → [[scoreAgainst]] split (the ANN fit/search
  * discipline).
  */
object Dsir {

  /** Per-bucket integer-micro log importance ratios for hashed
    * unigram+bigram features: (bucket, ratio_micro). `isTarget` marks
    * the example-of-target rows. Buckets never hit by the raw corpus
    * carry no mass a raw document can touch, so the table covers
    * exactly the buckets with occurrences (smoothing denominators
    * still use the full bucket count `b`).
    */
  def ratioTable(docs: DataFrame, isTarget: Column, b: Int): DataFrame =
    ratioFromOccurrences(occurrences(docs, isTarget, b), b)

  /** Ratio fit over an already-derived occurrence table — the face
    * [[importanceTopK]] shares its single materialization with.
    */
  private def ratioFromOccurrences(occ: DataFrame, b: Int): DataFrame = {
    val counts = occ.groupBy(col("bucket"))
      .agg(count(lit(1)).as("rc"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"))
    // single-row totals joined back to the B-sized count table: a
    // broadcast nested loop over 1 × B rows, bounded by construction
    // (PlanAudit whitelist carries the justification)
    val totals = counts.agg(sum(col("rc")).as("rtot"), sum(col("tc")).as("ttot"))
    counts.join(broadcast(totals))
      .withColumn("ratio_micro",
        lnMicro((col("tc") + 1).cast("double") / (col("ttot") + b).cast("double"))
          - lnMicro((col("rc") + 1).cast("double") / (col("rtot") + b).cast("double")))
      .select(col("bucket"), col("ratio_micro"))
  }

  /** Importance-score the whole corpus and keep the top `k` documents:
    * (doc_id, n_feats, score_micro), score_micro = Σ over the doc's
    * feature occurrences of the bucket's integer log ratio. Documents
    * with no features (sub-1-word) have no occurrences and are never
    * selected. Ties break on doc_id so selection is reproducible.
    */
  def importanceTopK(docs: DataFrame, isTarget: Column, b: Int = 1024,
                     k: Int = 50): DataFrame = {
    // one corpus scan: the occurrence projection feeds both the ratio
    // fit and the scoring pass, so materialize it eagerly and let both
    // read the cache (eviction before consumption merely recomputes
    // from lineage — correct, just slower). persist, not
    // localCheckpoint: the catalog-managed cache is what the session's
    // clearCache hygiene releases (§2.7).
    val occ = occurrences(docs, isTarget, b)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    occ.count()
    val ratios = broadcast(ratioFromOccurrences(occ, b))
    occ.join(ratios, Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("ratio_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Score a corpus against an already-fitted ratio table and keep the
    * top `k` — the deployment split (fit the ratios once on a sample
    * via [[ratioTable]], persist the B-row result, then select over
    * the full 100 TB corpus with ONE scan and zero re-fitting; the
    * Ann.fit/search discipline). Output schema matches
    * [[importanceTopK]]. `isTarget` is irrelevant to scoring; the
    * occurrence projection needs a value, so a literal is bound.
    */
  def scoreAgainst(docs: DataFrame, ratios: DataFrame, b: Int = 1024,
                   k: Int = 50): DataFrame =
    occurrences(docs, lit(false), b)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("ratio_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)

  /** floor(ln(x)·1e6) as int64 — the one float step, applied per
    * BUCKET (q165's quantize-once discipline), identical spelling on
    * both engines.
    */
  private def lnMicro(x: Column): Column =
    floor(log(x) * lit(1000000.0)).cast("long")

  /** (doc_id, is_target, bucket) — one row per unigram/bigram
    * occurrence, hashed to [0, b) by the native md5-60 kernel. The
    * feature strings die inside the projection; only 8-byte buckets
    * ever reach an exchange.
    */
  private def occurrences(docs: DataFrame, isTarget: Column, b: Int): DataFrame =
    docs
      .select(col("doc_id"), isTarget.as("is_target"),
        filter(Text.words(col("text")), x => x =!= lit("")).as("w"))
      .select(col("doc_id"), col("is_target"),
        explode(graft.plans.NativeFunctions.md5Hash60(
          concat(col("w"), expr(Text.shinglesSql("w", 2))), b.toLong)).as("bucket"))
}
