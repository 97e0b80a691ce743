package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining "concat the corpus, cut every
  * seq_len tokens" step: every document gets its global token offset in
  * a deterministic corpus order, from which its training bin and
  * in-bin position follow arithmetically.
  *
  * The core is a GLOBAL ordered prefix sum, which Spark's window
  * functions only express as an un-partitioned window — a corpus-sized
  * single-partition sort (the WindowExec "No Partition Defined" trap,
  * fatal at 100 TB). The scalable shape here is the classic two-phase
  * scan:
  *   1. `repartitionByRange(order)` — partitions are globally ordered
  *      (partition i's keys all precede partition i+1's; AQE coalescing
  *      merges adjacent ranges, preserving monotonicity);
  *   2. intra-partition running sum (window PARTITIONED by
  *      `spark_partition_id()` — fully parallel);
  *   3. per-partition totals (one row per partition) get their own
  *      prefix sum on a PARTITION-COUNT-sized single-partition window,
  *      then broadcast-join back as each partition's base offset.
  * Data-sized work is one range shuffle + parallel windows; the only
  * single-partition step touches `#partitions` rows.
  *
  * Reference analog: none (brief-mandated pipeline operator); the
  * packing arithmetic is the standard GPT-style dense packing (no
  * padding, documents straddle bin boundaries).
  */
object Pack {

  /** Adds `global_start`: sum of `nCol` over all rows strictly before
    * this one in ascending `orderCol` order (dense offsets, first row
    * 0). `orderCol` values must be unique — ties would make the split
    * across a partition boundary order-ambiguous.
    */
  def globalOffsets(docs: DataFrame, orderCol: String, nCol: String): DataFrame =
    globalOffsets(docs, Seq(orderCol), nCol)

  /** Multi-column order variant: the order key is the ascending
    * lexicographic tuple of `orderCols` (together unique — e.g. a
    * seeded shuffle hash disambiguated by doc id).
    */
  def globalOffsets(docs: DataFrame, orderCols: Seq[String], nCol: String): DataFrame = {
    val ranged = docs.repartitionByRange(orderCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
    val intraW = Window.partitionBy("_pid").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = ranged.withColumn("_run", sum(col(nCol).cast("long")).over(intraW))
    val totals = intra.groupBy(col("_pid")).agg(max(col("_run")).as("_tot"))
    val prefW = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val prefix = totals
      .withColumn("_pre", coalesce(sum(col("_tot")).over(prefW), lit(0L)))
      .select(col("_pid"), col("_pre"))
    intra.join(broadcast(prefix), Seq("_pid"))
      .withColumn("global_start", col("_pre") + col("_run") - col(nCol).cast("long"))
      .drop("_pid", "_run", "_pre")
  }

  /** Packs documents (doc_id, text) into `seqLen`-token training bins:
    * (doc_id, n_tokens, global_start, bin, offset, bins_spanned) where
    * bin/offset locate the document's first token and bins_spanned how
    * many consecutive bins it crosses (dense packing, no padding).
    * Token count = whitespace tokens of the normalized text (the q68
    * discipline); n_tokens ≥ 1 even for empty docs (split of "" is
    * [""]), so the arithmetic never divides a zero-length interval.
    */
  def packSequences(docs: DataFrame, seqLen: Int = 512): DataFrame = {
    val counted = docs.select(col("doc_id"),
      size(graft.functions.Text.words(col("text"))).cast("long").as("n_tokens"))
    globalOffsets(counted, "doc_id", "n_tokens")
      .withColumn("bin", expr(s"global_start div ${seqLen}L"))
      .withColumn("offset", col("global_start") % seqLen)
      .withColumn("bins_spanned",
        expr(s"(global_start + n_tokens - 1) div ${seqLen}L") - col("bin") + 1)
      .select(col("doc_id"), col("n_tokens"), col("global_start"),
        col("bin"), col("offset"), col("bins_spanned"))
  }

  /** Knuth multiplicative shuffle key, replayable on any SQL engine:
    * h = ((id mod p) * 2654435761 + seed) mod p with p = 2^31 - 1.
    * The inner mod keeps the product below 2^63 for ANY int64 id, so
    * the arithmetic is overflow-free (DuckDB BIGINT errors on
    * overflow rather than wrapping — the expression must never rely
    * on wraparound). NOT unique per id (p is small); always order by
    * (h, id).
    */
  private val shufP = 2147483647L // 2^31 - 1
  def shuffleKey(id: Column, seed: Long): Column =
    pmod(pmod(id, lit(shufP)) * lit(2654435761L) + lit(seed), lit(shufP))

  /** Deterministic training-shard plan — the OUTPUT stage of a
    * pretraining data pipeline: documents are (1) globally shuffled by
    * a seeded hash (decorrelates adjacent source docs; replayable, so
    * a re-run or a resumed job produces the identical layout),
    * (2) packed densely into `seqLen`-token bins via the two-phase
    * prefix sum, (3) bins grouped into contiguous `binsPerShard`
    * ranges — shard s owns the token interval
    * [s·binsPerShard·seqLen, (s+1)·binsPerShard·seqLen), so a trainer
    * reads each shard sequentially. Returns the per-shard manifest:
    * (shard_id, n_docs_starting, n_docs_touching, n_tokens,
    * first_bin, last_bin) — n_tokens sums each document's overlap with
    * the shard's token interval (a straddling document contributes to
    * both sides), so Σ n_tokens over shards equals the corpus token
    * count exactly: the writer/trainer integrity check.
    *
    * Scale shape: one corpus-thin (id, n_tokens) projection through
    * the prefix sum, then an explode of `shards_spanned` per document
    * — ≤ ⌈n_tokens/(binsPerShard·seqLen)⌉ + 1 rows each, ~1 for any
    * document shorter than a shard — and one hash aggregation on
    * shard_id. No corpus text moves; the manifest is shard-count
    * sized.
    */
  def shardManifest(docs: DataFrame, seqLen: Int = 512,
                    binsPerShard: Int = 16, seed: Long = 42L): DataFrame =
    manifestFromPlacement(
      shardPlacement(docs, seqLen, binsPerShard, seed), seqLen, binsPerShard)

  /** [[shardManifest]] over a PRE-COUNTED (doc_id, n_tokens) table —
    * see [[shardPlacementCounted]].
    */
  def shardManifestCounted(counted: DataFrame, seqLen: Int = 512,
                           binsPerShard: Int = 16, seed: Long = 42L,
                           orderPrefix: Seq[String] = Nil): DataFrame =
    manifestFromPlacement(
      shardPlacementCounted(counted, seqLen, binsPerShard, seed,
        orderPrefix = orderPrefix),
      seqLen, binsPerShard)

  /** Per-(document, shard) placement rows — what a shard writer
    * actually consumes: (doc_id, shard_id, global_start, n_tokens,
    * first_shard, slice_start, slice_len) where the document
    * contributes its token interval [slice_start, slice_start +
    * slice_len) to shard `shard_id` (slice_start is an offset INTO the
    * document; a straddler appears once per shard it touches).
    * `baseTokens` shifts every offset — the INCREMENTAL face: a new
    * batch packs immediately after an existing corpus of `baseTokens`
    * tokens without touching it (append-ordered packing; the seeded
    * shuffle then applies within the batch). One corpus-thin
    * projection through the two-phase prefix sum, explode of
    * shards-spanned rows per doc.
    *
    * Invariant the arithmetic leans on: n_tokens ≥ 1 for EVERY
    * document ([[packSequences]]' tokenizer contract — split of ""
    * is [""]), so last_shard ≥ first_shard always and the
    * `sequence(first, last)` explode can never see a descending
    * (first, first − 1) range (Spark would silently emit it with
    * step −1 where the DuckDB oracle's `range` emits nothing —
    * `PackSpec` pins the empty-doc case).
    */
  def shardPlacement(docs: DataFrame, seqLen: Int = 512,
                     binsPerShard: Int = 16, seed: Long = 42L,
                     baseTokens: Long = 0L): DataFrame =
    shardPlacementCounted(
      docs.select(col("doc_id"),
        size(graft.functions.Text.words(col("text"))).cast("long").as("n_tokens")),
      seqLen, binsPerShard, seed, baseTokens)

  /** [[shardPlacement]] over a PRE-COUNTED corpus-thin
    * (doc_id, n_tokens) table — the composition face: an upstream
    * selection that already carries token counts (the mix keep table,
    * a quality gate) feeds the packer without re-deriving counts from
    * text, and with the thin input persisted the prefix sum's two
    * passes never re-read the corpus. Caller contract: n_tokens ≥ 1
    * for every row (the [[packSequences]] tokenizer invariant —
    * whitespace-split of "" is [""]).
    */
  def shardPlacementCounted(counted0: DataFrame, seqLen: Int = 512,
                            binsPerShard: Int = 16, seed: Long = 42L,
                            baseTokens: Long = 0L,
                            orderPrefix: Seq[String] = Nil): DataFrame = {
    val shardTokens = binsPerShard.toLong * seqLen
    val counted = counted0.withColumn("h", shuffleKey(col("doc_id"), seed))
    // orderPrefix (e.g. a curriculum band rank) sorts BEFORE the seeded
    // shuffle: all of band 0's tokens lay out before band 1's, with the
    // shuffle decorrelating order within each band — the published
    // anneal-phase layout (highest-quality band last); empty prefix is
    // the plain seeded shuffle
    globalOffsets(counted, orderPrefix ++ Seq("h", "doc_id"), "n_tokens")
      .withColumn("global_start", col("global_start") + baseTokens)
      .withColumn("first_shard", expr(s"global_start div ${shardTokens}L"))
      .withColumn("last_shard",
        expr(s"(global_start + n_tokens - 1) div ${shardTokens}L"))
      .select(col("doc_id"), col("global_start"), col("n_tokens"),
        col("first_shard"),
        explode(sequence(col("first_shard"), col("last_shard"))).as("shard_id"))
      .withColumn("slice_start",
        greatest(col("global_start"), col("shard_id") * shardTokens)
          - col("global_start"))
      .withColumn("slice_len",
        least(col("global_start") + col("n_tokens"),
            (col("shard_id") + 1) * shardTokens)
          - greatest(col("global_start"), col("shard_id") * shardTokens))
      .drop("h")
  }

  /** Materialize the shard plan on disk: the placement rows written
    * `partitionBy(shard_id)` — one directory per shard, so a trainer
    * (or the token writer that cuts `slice_start`/`slice_len` from
    * each document) reads its shard's file list and nothing else.
    * Partition pruning on shard_id is the read-path contract
    * (`SourcesSpec`'s partitioned-write discipline).
    */
  def writeShards(docs: DataFrame, path: String, seqLen: Int = 512,
                  binsPerShard: Int = 16, seed: Long = 42L): Unit =
    shardPlacement(docs, seqLen, binsPerShard, seed)
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)

  private def manifestFromPlacement(placed: DataFrame, seqLen: Int,
                                    binsPerShard: Int): DataFrame = {
    placed
      .withColumn("tok_in_shard", col("slice_len"))
      .groupBy(col("shard_id"))
      .agg(
        sum(when(col("first_shard") === col("shard_id"), 1L).otherwise(0L))
          .as("n_docs_starting"),
        count(lit(1)).as("n_docs_touching"),
        sum(col("tok_in_shard")).as("n_tokens"),
        max(expr(s"(global_start + n_tokens - 1) div ${seqLen}L"))
          .as("_max_end_bin"))
      .withColumn("first_bin", col("shard_id") * binsPerShard)
      .withColumn("last_bin",
        least(col("_max_end_bin"), (col("shard_id") + 1) * binsPerShard - 1))
      .drop("_max_end_bin")
  }
}
