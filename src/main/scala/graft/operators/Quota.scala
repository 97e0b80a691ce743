package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-domain quota sampling — the "cap documents per host/domain" pass
  * of web-corpus pipelines (C4 keeps ≤ N pages per domain to stop a few
  * giant hosts dominating the training mix). Not a reference operator:
  * part of the brief's LLM-data-pipeline layer, like q126/q127.
  *
  * Semantics: for each domain keep the `k` documents with the smallest
  * deterministic hash rank (md5 of a salted id — content-independent, so
  * reprocessing or corpus growth never changes the *relative* rank of
  * surviving docs; ties impossible since the id feeds the hash).
  *
  * Scale design: a naive `row_number() OVER (PARTITION BY domain)` must
  * shuffle-sort EVERY row of a 100 TB corpus just to throw most of them
  * away, and a hot domain (half the web is one CDN) lands in one task.
  * Instead, two phases:
  *   1. per-domain counts — domain-cardinality-sized, map-side combined,
  *      broadcast back;
  *   2. a map-side hash prefilter keeps ~margin·k expected survivors per
  *      domain (rate = margin·k/count, capped at 1) — only survivors pay
  *      the window shuffle, so the sorted set is ~margin·k rows per
  *      domain regardless of corpus size.
  * The prefilter is part of the operator's deterministic contract (the
  * oracle replays it bit-for-bit): quota sampling needs *a* deterministic
  * pseudo-random k per domain, not a specific one.
  */
object Quota {

  /** 60-bit deterministic rank in [0, 2^60): salted md5 of the id. */
  private def rank(idCol: String) =
    expr(s"cast(conv(substring(md5(concat('quota|', cast($idCol as string))), 1, 15), 16, 10) as bigint)")

  /** Output schema: the input columns plus two audit columns the quota
    * decision is made from — `domain_n` (pre-quota domain size) and
    * `qrank` (1-based hash rank among survivors, ≤ k). They are part of
    * the contract (q145 oracles both); callers wanting only the kept
    * rows project them away.
    */
  def perDomain(docs: DataFrame, domainCol: String, idCol: String,
                k: Int, margin: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("domain_n"))
    val maxRank = 1152921504606846976L // 2^60
    val mk = margin.toLong * k
    // keep iff rank/2^60 < margin·k/domain_n. Exact int64 form:
    // rank < floor(2^60/domain_n)·mk, computed ONLY for domain_n > mk
    // (a lazily-evaluated CASE branch, so the product is provably
    // < 2^60 whenever it is evaluated — never int64 overflow, under any
    // predicate reordering); small domains take the other branch and
    // keep everything (rank is always < 2^60). A float comparison would
    // be unsafe exactly at the boundary the oracle replays.
    val survivors = docs
      .join(broadcast(counts), domainCol)
      .where(rank(idCol) <
        when(col("domain_n") <= mk, lit(maxRank))
          .otherwise(expr(s"${maxRank}L div domain_n") * mk))
    val w = Window.partitionBy(col(domainCol)).orderBy(rank(idCol), col(idCol))
    survivors
      .withColumn("qrank", row_number().over(w))
      .where(col("qrank") <= k)
  }
}
