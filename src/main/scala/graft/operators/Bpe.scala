package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** BPE tokenizer-training statistics (Sennrich et al., ACL 2016 —
  * "Neural Machine Translation of Rare Words with Subword Units"): the
  * inner loop of byte-pair-encoding training is "count adjacent symbol
  * pairs over the corpus, merge the most frequent" — this operator is
  * that loop's distributed statistics pass at the character stage,
  * reporting for each top candidate pair BOTH counts the loop needs:
  *
  *  - `n_adjacent`: occurrences of the pair as adjacent symbols,
  *    overlapping ("aaa" contains "aa" twice) — the get_stats count
  *    that RANKS merge candidates in the reference implementation;
  *  - `n_merge_apply`: occurrences a left-to-right non-overlapping
  *    merge would actually fuse ("aaa" → [aa, a], one fusion) — the
  *    token-count reduction applying that merge buys. Computed without
  *    regexes as (len(word) − len(replace(word, pair, ''))) / 2:
  *    SQL `replace` scans left-to-right non-overlapping on both
  *    engines, exactly the BPE application order.
  *
  * Scale shape — the reason BPE training is feasible on a 100 TB
  * corpus at all: after ONE corpus scan builds the word-frequency
  * table, every round of the training loop runs against the
  * VOCAB-sized table (words × frequencies), not the corpus. Here:
  * corpus scan → word counts (one hash shuffle, map-side combined);
  * pair stats explode ~len(word) rows per DISTINCT word; candidate
  * ranking is top-k via TakeOrderedAndProject; the merge-apply count
  * joins the k-row candidate table against the vocab (bounded k×|V|
  * nested loop, whitelisted). Subsequent merge rounds would rerun the
  * same vocab-sized pass on re-tokenized symbols — never the corpus.
  */
object Bpe {

  /** Top-`k` adjacent character pairs over the corpus's words:
    * (pair, n_adjacent, n_merge_apply), ranked by n_adjacent with a
    * lexicographic pair tie-break (deterministic merge choice — the
    * first row IS the round's merge).
    */
  def pairStats(docs: DataFrame, k: Int = 20): DataFrame = {
    // the vocab table feeds BOTH the candidate ranking and the
    // merge-apply count — persist it so the corpus is scanned once
    // (r10 scan audit; it is also the table the multi-round training
    // loop iterates on)
    val wf = wordFreq(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    wf.count()
    // overlapping adjacent-pair counts: every 2-char substring of every
    // distinct word, weighted by word frequency (Sennrich get_stats)
    val top = wf.filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")).as("pair"),
        col("freq"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("n_adjacent"))
      .orderBy(col("n_adjacent").desc, col("pair"))
      .limit(k)
    // non-overlapping application count for each candidate: k-row
    // broadcast against the vocab table (bounded by construction).
    // The final orderBy re-establishes the ranking the join+groupBy
    // discards (aggregate output order is unspecified) — it sorts k
    // rows, and it is what makes "the first row IS the merge" true.
    broadcast(top).join(wf)
      .groupBy(col("pair"), col("n_adjacent"))
      .agg(sum(col("freq") *
        expr("(length(word) - length(replace(word, pair, ''))) div 2")).as("n_merge_apply"))
      .select(col("pair"), col("n_adjacent"), col("n_merge_apply"))
      .orderBy(col("n_adjacent").desc, col("pair"))
  }

  /** (word, freq) over the corpus — the table BPE training iterates
    * on. One corpus scan, one map-side-combined hash shuffle.
    */
  def wordFreq(docs: DataFrame): DataFrame =
    docs
      .select(explode(filter(Text.words(col("text")), w => w =!= lit(""))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
}
