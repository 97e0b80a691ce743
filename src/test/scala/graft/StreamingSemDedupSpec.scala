package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Ann, SemDedup}

/** Continuous SemDeDup ingestion (r10; the r9 VERDICT item 8): vectors
  * arrive as a stream; each micro-batch is encoded against the FITTED
  * IVF model (broadcast centroids, zero re-clustering), probes the
  * accumulated cluster index for semantic duplicates
  * (SemDedup.dupsAgainstIndex), and appends its encodings via
  * foreachBatch — the k-means twin of StreamingAnnSpec's LSH loop. At
  * scale the index is the SAME persisted bucketed-by-cluster table the
  * ANN search path reads, so the streaming dedup loop maintains the
  * search index as a side effect.
  */
class StreamingSemDedupSpec extends SparkSpec {

  test("stream == batch: planted twins are flagged across micro-batches, nothing else") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val base = Tables.embeddings(spark, sfDir).limit(20)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val twins = base.take(3).map { case (id, e) => (id + 9000L, e) }
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")

    // BATCH truth: the self-contained composition over base ∪ twins.
    // At 0.999 only identical twins qualify (natural max cosine is far
    // below — SemDedupSpec), so the expected set is exactly the twins.
    val full = base.toSeq.toDF("vec_id", "embedding")
      .unionByName(twins.toSeq.toDF("vec_id", "embedding"))
    val batchPairs = SemDedup.dupPairs(full, threshold = 0.999, c = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs == base.take(3).map(b => (b._1, b._1 + 9000L)).toSet)

    // STREAM: fit once on the base corpus (the deployment posture — the
    // model predates the stream), seed the index with the base encode,
    // then ingest the twins as a later micro-batch.
    val cents = Ann.ivfFit(base.toSeq.toDF("vec_id", "embedding"), c = 8)
    var index: DataFrame = Ann.ivfEncode(
      base.toSeq.toDF("vec_id", "embedding"), cents).localCheckpoint()
    val dups = collection.mutable.Set[(Long, Long)]()

    val stream = MemoryStream[Vec]
    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val vecs = batch.select("vec_id", "embedding")
        dups ++= SemDedup.dupsAgainstIndex(vecs, cents, index, threshold = 0.999)
          .select("new_id", "old_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        index = index.unionByName(Ann.ivfEncode(vecs, cents)).localCheckpoint()
        ()
      }
      .start()
    try {
      stream.addData(twins.take(2).map { case (id, e) => Vec(id, e, t0) }.toSeq)
      query.processAllAvailable()
      stream.addData(Seq(Vec(twins(2)._1, twins(2)._2, t0)))
      query.processAllAvailable()
      // orient stream pairs as (old, new) to match the batch (va < vb)
      val oriented = dups.map { case (n, o) => (o, n) }.toSet
      assert(oriented == batchPairs, s"stream $oriented vs batch $batchPairs")
    } finally query.stop()
  }

  test("a batch vector duplicating an EARLIER STREAMED vector is flagged too") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val base = Tables.embeddings(spark, sfDir).limit(10)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val cents = Ann.ivfFit(base.toSeq.toDF("vec_id", "embedding"), c = 4)
    var index: DataFrame = Ann.ivfEncode(
      base.toSeq.toDF("vec_id", "embedding"), cents).localCheckpoint()
    val dups = collection.mutable.Set[(Long, Long)]()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")

    val stream = MemoryStream[Vec]
    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val vecs = batch.select("vec_id", "embedding")
        dups ++= SemDedup.dupsAgainstIndex(vecs, cents, index, threshold = 0.999)
          .select("new_id", "old_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        index = index.unionByName(Ann.ivfEncode(vecs, cents)).localCheckpoint()
        ()
      }
      .start()
    try {
      // batch 1: a NOVEL vector (not in the base corpus)
      val novel = base.head._2.map(v => -v)
      stream.addData(Seq(Vec(7000L, novel, t0)))
      query.processAllAvailable()
      assert(!dups.exists(_._1 == 7000L), "novel vector must not be flagged")
      // batch 2: its exact twin — must match against the STREAMED history
      stream.addData(Seq(Vec(7001L, novel, t0)))
      query.processAllAvailable()
      assert(dups.contains((7001L, 7000L)), s"got $dups")
    } finally query.stop()
  }
}
