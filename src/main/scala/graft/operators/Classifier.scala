package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the modern model-in-the-loop
  * quality gate of a pretraining pipeline (the CCNet/fastText linear
  * classifier, Wenzek et al. 2020 §4.3; FineWeb-Edu's educational-value
  * scorer, Penedo et al. 2024): label a SEED split (your curated corpus
  * vs the crawl), learn per-word weights from it, then score every
  * document as the weighted mean of its word weights — exactly the
  * fastText shape (a linear classifier over averaged word features)
  * with 1-dimensional word features.
  *
  * Determinism discipline: weights are integer ppm odds —
  * weight_ppm(w) = cnt_pos(w)·10⁶ div cnt_all(w), the empirical
  * P(seed-positive | word) — and a document's score is the integer
  * div of Σ cw·weight by Σ cw. No logs, no floats: every step is
  * exact int64/HUGEINT arithmetic identical on both engines, so the
  * whole train→deploy composition rides the FULL hash-matched oracle
  * (unlike log-likelihood NB, whose libm `ln` is not engine-exact).
  *
  * Scale shape: FIT is one corpus-thin (word, is_pos) aggregation into
  * a vocab-sized weight table (the persisted model artifact — the
  * ivfFit posture); SCORE is one (doc_id, word) map-side-combined
  * aggregation joined to the weight table on the unique word key, then
  * one per-doc sum. A 100 TB corpus pays one scan per phase and the
  * weight table is reusable across snapshots ([[scoreAgainst]] — the
  * streaming face scores arriving batches against FROZEN weights,
  * `StreamingCurationSpec`).
  */
object Classifier {

  /** The training alphabet (the shared Text.alphabetWords contract):
    * lowercase alnum word forms only.
    */
  private def words(docs: DataFrame): DataFrame =
    graft.functions.Text.alphabetWords(docs, Seq(col("doc_id")))

  /** Per-word integer odds weights from a labeled seed split:
    * (word, cnt_pos, cnt_all, weight_ppm) for words with cnt_all ≥
    * `minDf` (rare words carry label noise, not signal — the fastText
    * minCount knob). `posPred` is evaluated against the full document
    * row (the q128 evalDocPred posture: in production the positive set
    * is the curated corpus, here a column predicate). A NULL predicate
    * result (e.g. a NULL source) counts as NEGATIVE — stated contract:
    * unlabeled mass is background, never silently positive.
    *
    * cnt_pos·10⁶ runs in DECIMAL(38,0) (HUGEINT in the oracle): a stop
    * word's corpus count crosses the int64·10⁶ wrap (~9.2e12) far
    * below 100 TB — the Mix overflow discipline.
    */
  def fitOdds(docs: DataFrame, posPred: Column, minDf: Int = 2): DataFrame =
    graft.functions.Text.alphabetWords(docs, Seq(posPred.as("is_pos")))
      .groupBy(col("word"))
      .agg(sum(when(col("is_pos"), 1L).otherwise(0L)).as("cnt_pos"),
        count(lit(1)).as("cnt_all"))
      .filter(col("cnt_all") >= minDf)
      .withColumn("weight_ppm", expr(
        "cast(cast(cnt_pos as decimal(38,0)) * 1000000 div cnt_all as bigint)"))

  /** Score every document against a trained weight table: (doc_id,
    * n_scored, score_ppm) — n_scored the in-vocabulary token count,
    * score_ppm the integer weighted mean of word weights. Documents
    * with NO in-vocabulary words are absent (they carry no evidence;
    * a downstream gate treats absence as its own bucket — stated
    * contract). Weights are the deployment artifact: this face never
    * reads labels and never re-derives counts.
    */
  def scoreAgainst(docs: DataFrame, weights: DataFrame): DataFrame =
    words(docs)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cw"))
      .join(weights.select(col("word"), col("weight_ppm")), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cw")).as("n_scored"),
        expr("cast(sum(cw * weight_ppm) div sum(cw) as bigint)").as("score_ppm"))

  /** The one-corpus train→deploy composition (q207's face): fit on the
    * seed split, score the same corpus. The weight table is
    * materialized once (vocab-sized) so the score join never re-runs
    * the fit aggregation.
    *
    * SHARED WORDS PASS (r17, guide §1.2 "don't compute things twice"):
    * fit and score both start from the same alphabet-words explosion of
    * the same corpus — the serial [[fitOdds]]∘[[scoreAgainst]]
    * composition ran the text→words explode + a words-shuffle TWICE.
    * Here the (doc_id, word, cw, is_pos) aggregation is computed once
    * (map-side combined — its reducer input is distinct-(doc, word)
    * sized, the same bytes [[scoreAgainst]]'s first aggregation already
    * shuffles) and persisted; the fit re-aggregates it per word
    * (cnt_pos = Σ cw·is_pos, cnt_all = Σ cw — exactly [[fitOdds]]'
    * token counts, since is_pos is constant per document) and the score
    * join reads it back. One corpus scan and one corpus-sized shuffle
    * instead of two of each; the scored table is materialized eagerly
    * and the shared pass released (the Dedup.materializeAndRelease
    * discipline). Output is row-identical to fitOdds∘scoreAgainst —
    * ClassifierSpec pins the composition against the oracle arithmetic.
    */
  def trainScore(docs: DataFrame, posPred: Column, minDf: Int = 2): DataFrame = {
    val dw = graft.functions.Text.alphabetWords(
        docs, Seq(col("doc_id"), posPred.as("is_pos")))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cw"), first(col("is_pos")).as("is_pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NULL predicate counts NEGATIVE (the fitOdds contract): when(is_pos)
    // treats NULL as false, matching fitOdds' when(is_pos, 1L) per token
    val weights = dw.groupBy(col("word"))
      .agg(sum(when(col("is_pos"), col("cw")).otherwise(0L)).as("cnt_pos"),
        sum(col("cw")).as("cnt_all"))
      .filter(col("cnt_all") >= minDf)
      .select(col("word"), expr(
        "cast(cast(cnt_pos as decimal(38,0)) * 1000000 div cnt_all as bigint)")
        .as("weight_ppm"))
      .localCheckpoint(true)
    val out = dw.join(weights, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cw")).as("n_scored"),
        expr("cast(sum(cw * weight_ppm) div sum(cw) as bigint)").as("score_ppm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    dw.unpersist(blocking = true)
    out
  }

  /** MULTI-CLASS per-word integer odds weights — the reference's
    * `classify(features, model)` contract (presto-ml
    * MLFunctions.java:56 returns the predicted class for a feature
    * vector under a trained Classifier model; its libsvm TRAINING is
    * excluded — version-coupled foreign numerics, see SURVEY §2.2 —
    * but the classify surface itself is this deterministic analog).
    * A DENSE (word × label) grid: weight_ppm(w, l) =
    * cnt_l(w)·10⁶ div cnt_all(w), the empirical P(label | word), with
    * absent (word, label) cells explicit zeros so every label's
    * denominator in [[classifyAgainst]] is the same in-vocab token
    * count and the argmax is well-defined. Rows with a NULL label are
    * EXCLUDED from training (unlabeled mass is background — the
    * fitOdds posture). Vocab-sized × |labels| — still a model-sized
    * artifact (the ivfFit posture: persist it, score forever).
    */
  def fitOddsMulti(docs: DataFrame, labelCol: Column,
                   minDf: Int = 2): DataFrame = {
    val lw = graft.functions.Text.alphabetWords(
      docs.filter(labelCol.isNotNull), Seq(labelCol.as("label")))
    val wc = lw.groupBy(col("word"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val wt = wc.groupBy(col("word")).agg(sum(col("cnt")).as("cnt_all"))
      .filter(col("cnt_all") >= minDf)
    val labels = wc.select(col("label")).distinct()
    wt.crossJoin(broadcast(labels))
      .join(wc, Seq("word", "label"), "left")
      .select(col("word"), col("label"), expr(
        "cast(cast(coalesce(cnt, 0L) as decimal(38,0)) * 1000000 div cnt_all as bigint)")
        .as("weight_ppm"))
  }

  /** Predict each document's class against a trained multi-class
    * weight table: (doc_id, pred_label, score_ppm, n_scored) — the
    * argmax over per-label integer weighted means (ties broken by
    * label order, replay-deterministic), i.e. the reference
    * `classify`'s return-the-winning-class contract. Documents with no
    * in-vocabulary words are absent (no evidence — the scoreAgainst
    * contract). One (doc_id, word) map-side-combined aggregation, one
    * unique-word join to the model grid, a per-doc window over
    * |labels| rows — never corpus-global.
    */
  def classifyAgainst(docs: DataFrame, weights: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = words(docs)
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cw"))
      .join(weights.select(col("word"), col("label"), col("weight_ppm")),
        Seq("word"))
      .groupBy(col("doc_id"), col("label"))
      .agg(expr(
        "cast(sum(cast(cw as decimal(38,0)) * weight_ppm) div sum(cw) as bigint)")
        .as("score_ppm"),
        sum(col("cw")).as("n_scored"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("label"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        col("score_ppm"), col("n_scored"))
  }

  /** The one-corpus multi-class train→classify composition (q221's
    * face): fit the dense odds grid on the labeled corpus, predict the
    * same corpus. The grid is materialized once (model-sized).
    *
    * SHARED WORDS PASS (r17 — the [[trainScore]] restructure): fit and
    * classify both explode the same corpus; compute the
    * (doc_id, word, cw, label) aggregation once, derive the fit's
    * per-(word, label) counts from it (label is constant per document,
    * and NULL-labeled docs are excluded from training exactly as
    * [[fitOddsMulti]]'s filter does), and classify from the same
    * persisted pass. Row-identical output; one corpus scan + one
    * corpus-sized shuffle instead of two of each.
    */
  def trainClassify(docs: DataFrame, labelCol: Column,
                    minDf: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dw = graft.functions.Text.alphabetWords(
        docs, Seq(col("doc_id"), labelCol.as("label")))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cw"), first(col("label")).as("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fitOddsMulti's (word, label) token counts, re-aggregated from the
    // shared pass: cnt(w, l) = Σ_{docs with label l} cw
    val wc = dw.filter(col("label").isNotNull)
      .groupBy(col("word"), col("label"))
      .agg(sum(col("cw")).as("cnt"))
      .localCheckpoint(true)
    val wt = wc.groupBy(col("word")).agg(sum(col("cnt")).as("cnt_all"))
      .filter(col("cnt_all") >= minDf)
    val labels = wc.select(col("label")).distinct()
    val weights = wt.crossJoin(broadcast(labels))
      .join(wc, Seq("word", "label"), "left")
      .select(col("word"), col("label"), expr(
        "cast(cast(coalesce(cnt, 0L) as decimal(38,0)) * 1000000 div cnt_all as bigint)")
        .as("weight_ppm"))
      .localCheckpoint(true)
    val scored = dw.select(col("doc_id"), col("word"), col("cw"))
      .join(weights, Seq("word"))
      .groupBy(col("doc_id"), col("label"))
      .agg(expr(
        "cast(sum(cast(cw as decimal(38,0)) * weight_ppm) div sum(cw) as bigint)")
        .as("score_ppm"),
        sum(col("cw")).as("n_scored"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("label"))
    val out = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"),
        col("score_ppm"), col("n_scored"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    dw.unpersist(blocking = true)
    out
  }

  /** Corpus-RELATIVE decile (0–9) attached to each scored document —
    * absolute ppm scores cluster around the seed prior (every doc's
    * weighted mean sits near P(pos)), so a filtering gate cuts by RANK,
    * the CCNet tercile discipline. Tied scores share a decile
    * (decile = docs-strictly-below ·10 div n — exact integers, no
    * order-dependence).
    *
    * Scale shape: the rank computation runs on the DISTINCT-score
    * HISTOGRAM (≤ 10⁶+1 rows by value range — score_ppm is an integer
    * ppm), never on corpus rows: one map-side-combined histogram
    * aggregation, one VALUE-BOUNDED global cumulative window (the Pack
    * per-partition-totals whitelist class), and a thin join back on
    * score_ppm.
    */
  def withDeciles(scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus-thin (doc_id, n_scored, score_ppm), materialized once (the
    // ccnetBuckets posture): the histogram, the total and the join-back
    // are three readers — unmaterialized, each would re-run the whole
    // scoring pipeline from its documents scan (PlanAudit multi-scan)
    val sc = scores.localCheckpoint(true)
    val hist = sc.groupBy(col("score_ppm")).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cb",
      coalesce(sum(col("c")).over(Window.orderBy(col("score_ppm"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // single-row total side (the q136/q140 broadcast idiom)
    val n = sc.agg(count(lit(1)).as("n"))
    val dec = cum.crossJoin(broadcast(n))
      .select(col("score_ppm"), expr("cast(cb * 10 div n as bigint)").as("decile"))
    sc.join(dec, Seq("score_ppm"))
      .select(col("doc_id"), col("n_scored"), col("score_ppm"), col("decile"))
  }
}
