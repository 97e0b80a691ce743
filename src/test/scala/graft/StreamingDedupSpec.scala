package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The continuous-ingestion dedup loop: documents arrive as a stream;
  * each micro-batch is checked against the ACCUMULATED signature index
  * (Dedup.minhashCandidatesAgainst) and then merged into it via
  * foreachBatch — the production shape for streaming corpus dedup,
  * where the index is a persisted table and each batch touches only
  * its own band buckets.
  */
case class Doc(doc_id: Long, text: String, ts: Timestamp)

class StreamingDedupSpec extends SparkSpec {

  test("foreachBatch incremental dedup flags near-dups across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val other = "completely different content about spark catalyst optimizer internals"
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")

    val stream = MemoryStream[Doc]
    // index starts empty; grows by each batch's bands
    var index: DataFrame = Dedup.minhashBands(
      Dedup.minhashSignatures(Seq.empty[(Long, String)].toDF("doc_id", "text")))
    val dups = collection.mutable.Set[(Long, Long)]()

    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val docs = batch.select("doc_id", "text")
        dups ++= Dedup.minhashCandidatesAgainst(docs, index)
          .select("new_id", "old_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        index = index.unionByName(
          Dedup.minhashBands(Dedup.minhashSignatures(docs))).localCheckpoint()
        ()
      }
      .start()
    try {
      stream.addData(Seq(Doc(1, base, t0), Doc(2, other, t0)))
      query.processAllAvailable()
      stream.addData(Seq(Doc(3, near, t0))) // near-dup of batch-1's doc 1
      query.processAllAvailable()
      assert(dups.contains((3L, 1L)), s"got $dups")
      assert(!dups.exists(_._1 == 2L))
    } finally query.stop()
  }
}
