package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlShims

import graft.plans.{BloomAgg, BloomMightContain}

/** Bloom-pruned semi join (see graft.plans.GraftBloom for the sketch).
  *
  * `fact ⋉ dim` where the dim side is too big to broadcast as a hash
  * relation but its KEY SET compresses into a bloom filter: build the
  * filter distributed (partial-agg bitwise-OR merge), broadcast the one
  * resulting row, drop fact rows map-side, then run the exact semi join
  * on the survivors. At 100 TB this turns "shuffle every fact row" into
  * "shuffle fact rows that probably match" — for a selective dim the
  * shuffle shrinks by 10–1000×, at the cost of one scan of dim and a
  * false-positive rate that only wastes bandwidth, never correctness
  * (the exact join runs after).
  */
object Bloom {

  def bloomAgg(key: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    GraftSqlShims.column(
      BloomAgg(GraftSqlShims.expression(key.cast("long")), numBits, numHashes)
        .toAggregateExpression())

  def mightContain(bloom: Column, key: Column, numHashes: Int = 5): Column =
    GraftSqlShims.column(BloomMightContain(
      GraftSqlShims.expression(bloom),
      GraftSqlShims.expression(key.cast("long")), numHashes))

  /** Streaming first-seen filter (dedup-at-ingestion): keep a batch's
    * rows whose key the accumulated bloom has NOT seen, and fold the
    * batch's keys into the state. State is the serialized filter —
    * model-sized (numBits/8 bytes, like the k-means centroids), carried
    * across foreachBatch micro-batches on the driver.
    *
    * Approximation contract: a seen key NEVER passes again — neither
    * across batches (the state filter) nor within one batch (the batch
    * is key-deduplicated before the state filter, keeping one arbitrary
    * representative per key, the standard ingestion-dedup contract); a
    * genuinely new key is dropped with probability = the filter's FPP
    * (tunable via numBits for the expected corpus cardinality). That
    * asymmetry — drop a few novel items, never re-admit a duplicate —
    * is the posture ingestion dedup wants at 100 TB, where exact state
    * would be a corpus-sized shuffle-join per batch.
    */
  def firstSeen(batch: DataFrame, key: String, state: Array[Byte],
                numHashes: Int = 5): (DataFrame, Array[Byte]) = {
    val once = batch.dropDuplicates(key)
    val pass = once.where(!mightContain(lit(state), col(key), numHashes))
    val batchBloom = once.agg(bloomAgg(col(key), state.length * 8, numHashes))
      .collect()(0).getAs[Array[Byte]](0)
    val merged = state.clone()
    var i = 0
    while (i < merged.length) { merged(i) = (merged(i) | batchBloom(i)).toByte; i += 1 }
    (pass, merged)
  }

  /** fact rows whose `factKey` appears in `dim.dimKey` — bloom-pruned,
    * then exactly verified by a semi join.
    *
    * EAGER: constructing this DataFrame launches the filter-build job
    * over `dim` immediately (a collect of numBits/8 bytes), before the
    * returned plan is executed — the same two-job staging engine-native
    * runtime filters use for their build subquery.
    */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    // Materialize the filter driver-side (numBits/8 bytes — model-sized,
    // like k-means centroids) and embed it as a LITERAL: codegen then
    // references ONE byte[] object. The broadcast-row alternative
    // (crossJoin + binary column) re-copies the whole array out of the
    // joined row on EVERY probe — measured 6 µs/row on a 128 KB filter,
    // turning the map-side prune into the bottleneck.
    val bytes = dim.agg(bloomAgg(col(dimKey), numBits, numHashes))
      .collect()(0).getAs[Array[Byte]](0)
    // A saturated filter passes everything: the prune silently becomes a
    // no-op (correctness is preserved by the exact semi join below, but
    // the shuffle reduction vanishes). Surface that so callers size
    // numBits to the dim cardinality instead of shipping a dead filter.
    val setBits = bytes.map(b => java.lang.Integer.bitCount(b & 0xff)).sum
    if (setBits * 2 > numBits)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"bloom fill ratio ${setBits.toDouble / numBits}%.2f exceeds 0.5 " +
          s"($setBits/$numBits bits): FPP degrades toward 1 — raise numBits " +
          "toward ~10x the dim key cardinality")
    val dimKeys = dim.select(col(dimKey)).distinct()
    val pruned = fact.where(mightContain(lit(bytes), col(factKey), numHashes))
    pruned.join(dimKeys, pruned(factKey) === dimKeys(dimKey), "left_semi")
  }
}
