package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Per-source corpus REPORT CARD (q199) decomposed into MERGEABLE
  * partials, so the same arithmetic serves the batch dashboard and the
  * streaming one (accumulate per-batch partials, finalize on demand —
  * the operations view of a live ingestion). All state is
  * aggregate-sized except the content-hash counts (doc-count-thin, the
  * accumulated-index posture minhash/winnow ingestion already uses).
  *
  * Exactness: every merged quantity is an int64 count/sum or an
  * order-free min/max; the quality MEAN finalizes from integer 1e-4
  * units with the half-up integer division (the q165 rounding form),
  * so batch boundaries cannot move any output digit — stream == batch
  * exactly (`StreamingReportSpec`).
  */
object Report {

  /** Corpus-thin per-doc projection: (doc_id, source, lang, ch,
    * n_words, quality, q4) — quality features and the exact-dup
    * content hash ride ONE text scan (Quality.score carry).
    */
  def thin(docs: DataFrame): DataFrame =
    Quality.score(docs.withColumn("ch", md5(Text.normText(col("text")))),
        carry = Seq("source", "lang", "ch"))
      .select(col("doc_id"), col("source"), col("lang"), col("ch"),
        col("n_words").cast("long").as("n_words"), col("quality"),
        round(col("quality") * 10000).cast("long").as("q4"))

  /** Per-source mergeable partials (count/sum/min/max). */
  def srcPartials(thin: DataFrame): DataFrame =
    thin.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"),
      sum(col("q4")).as("sq4"),
      min(col("quality")).as("min_q"), max(col("quality")).as("max_q"))

  /** Per-(source, lang) doc counts — the language-spread state. */
  def langPartials(thin: DataFrame): DataFrame =
    thin.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cnt"))

  /** Per-(ch, source) doc counts — the exact-dup state (a hash is a
    * duplicate group when its count summed ACROSS sources exceeds 1).
    */
  def hashPartials(thin: DataFrame): DataFrame =
    thin.groupBy(col("ch"), col("source")).agg(count(lit(1)).as("n"))

  /** Merge two partial states — union + re-aggregate, associative and
    * commutative, so any batch split folds to the same state.
    */
  def mergeSrc(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source")).agg(
      sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
      sum(col("sq4")).as("sq4"),
      min(col("min_q")).as("min_q"), max(col("max_q")).as("max_q"))

  def mergeLang(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"), col("lang"))
      .agg(sum(col("cnt")).as("cnt"))

  def mergeHash(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("ch"), col("source"))
      .agg(sum(col("n")).as("n"))

  /** Finalize the report card from accumulated partials:
    * (source, n_docs, n_tokens, n_langs, top_lang, dup_docs, dup_rate,
    * avg_quality, min_q, max_q). Language mode = max count with the
    * lexicographic tie-break (struct-min); dup hashes are rare by
    * construction and broadcast back.
    */
  def card(src: DataFrame, lang: DataFrame, hash: DataFrame): DataFrame = {
    val spread = lang
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"),
        min(struct((-col("cnt")).as("nc"), col("lang").as("lg"))).as("mm"))
      .select(col("source"), col("n_langs"), col("mm.lg").as("top_lang"))
    val dupHashes = hash.groupBy(col("ch"))
      .agg(sum(col("n")).as("nh")).filter(col("nh") > 1).select(col("ch"))
    val dup = hash.join(broadcast(dupHashes), Seq("ch"))
      .groupBy(col("source")).agg(sum(col("n")).as("dup_docs"))
    src.join(broadcast(spread), "source")
      .join(broadcast(dup), Seq("source"), "left")
      .withColumn("dup_docs", coalesce(col("dup_docs"), lit(0L)))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("top_lang"), col("dup_docs"),
        round(col("dup_docs").cast("double") / col("n_docs"), 6).as("dup_rate"),
        (expr("(2 * sq4 + n_docs) div (2 * n_docs)").cast("double") / 10000.0)
          .as("avg_quality"),
        col("min_q"), col("max_q"))
  }

  /** The batch face (q199): one thin scan, partials, finalize. */
  def card(thin: DataFrame): DataFrame =
    card(srcPartials(thin), langPartials(thin), hashPartials(thin))

  /** Corpus-SNAPSHOT diff (r15): what changed between two corpus
    * versions — the QA table an iterative curation loop reads after
    * every pipeline change (did the new filter remove what it claimed,
    * and ONLY that?). Per source: documents added / removed /
    * content-changed / unchanged (content identity = the [[thin]]
    * normalized md5, so formatting-only edits don't count as changes)
    * and the whitespace-token delta (int64, new − old; negative =
    * shrink). Both sides reduce to corpus-THIN (doc_id, source, ch,
    * toks) projections before the single full-outer equi-join on the
    * unique doc_id — text never rides the exchange, the output is
    * |sources| rows, and row PRESENCE is detected by markers, not
    * column nullness (the savingsFromState r15 discipline: a NULL
    * source is a legitimate value, not an absence signal).
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    corpusDiffFromState(diffThin(oldDocs), diffThin(newDocs))

  /** Corpus-thin per-doc diff projection: (doc_id, source, ch, toks) —
    * the per-snapshot STATE [[corpusDiffFromState]] joins. Streaming
    * posture (the savingsFromState family): each arriving batch of a
    * snapshot contributes its thin projection, accumulated by plain
    * union — a snapshot carries each doc_id once by ingestion
    * contract, so no merge arithmetic is needed and the text never
    * outlives its batch.
    */
  def diffThin(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      md5(Text.normText(col("text"))).as("ch"),
      expr("cast(size(split(trim(text), '\\\\s+')) as bigint)").as("toks"))

  /** The diff over two accumulated thin states (see [[corpusDiff]] for
    * the semantics; `StreamingReportSpec` pins stream == batch).
    */
  def corpusDiffFromState(oldThin: DataFrame, newThin: DataFrame): DataFrame = {
    def side(thin: DataFrame, tag: String): DataFrame =
      thin.select(col("doc_id"),
        col("source").as(s"${tag}_source"),
        col("ch").as(s"${tag}_ch"),
        col("toks").as(s"${tag}_toks"),
        lit(true).as(s"__has_$tag"))
    side(oldThin, "old").join(side(newThin, "new"), Seq("doc_id"), "full_outer")
      .select(
        // Attribute by PRESENCE, not nullness: a doc in both snapshots
        // belongs to its NEW source even when that source is NULL.
        when(col("__has_new").isNotNull, col("new_source"))
          .otherwise(col("old_source")).as("source"),
        when(col("__has_old").isNull, 1L).otherwise(0L).as("added"),
        when(col("__has_new").isNull, 1L).otherwise(0L).as("removed"),
        // Null-safe content compare (<=>): a doc with NULL text on both
        // sides (md5 null) is UNCHANGED, so every both-sides row lands
        // in exactly one bucket and per-source counts sum to join rows.
        when(col("__has_old").isNotNull && col("__has_new").isNotNull &&
          !(col("old_ch") <=> col("new_ch")), 1L).otherwise(0L).as("changed"),
        when(col("__has_old").isNotNull && col("__has_new").isNotNull &&
          (col("old_ch") <=> col("new_ch")), 1L).otherwise(0L).as("unchanged"),
        (coalesce(col("new_toks"), lit(0L)) - coalesce(col("old_toks"), lit(0L)))
          .as("tok_delta"))
      .groupBy(col("source"))
      .agg(sum(col("added")).as("n_added"),
        sum(col("removed")).as("n_removed"),
        sum(col("changed")).as("n_changed"),
        sum(col("unchanged")).as("n_unchanged"),
        sum(col("tok_delta")).as("tok_delta"))
  }
}
