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
  def globalOffsets(docs: DataFrame, orderCol: String, nCol: String): DataFrame = {
    val ranged = docs.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id())
    val intraW = Window.partitionBy("_pid").orderBy(orderCol)
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
}
