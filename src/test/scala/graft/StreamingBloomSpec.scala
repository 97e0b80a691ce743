package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Streaming first-seen filtering (Bloom.firstSeen): dedup-at-ingestion
  * with bounded state carried across foreachBatch micro-batches —
  * a duplicate key is NEVER re-admitted (no false negatives once
  * added); a novel key is dropped only at the filter's FPP.
  */
class StreamingBloomSpec extends SparkSpec {

  test("foreachBatch first-seen filter admits each key at most once across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val stream = MemoryStream[Long]
    var state = new Array[Byte]((1 << 20) / 8) // 2^20-bit filter, empty
    val admitted = collection.mutable.ArrayBuffer[Long]()

    val query = stream.toDS().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val (pass, newState) = Bloom.firstSeen(batch, "k", state)
        admitted ++= pass.collect().map(_.getLong(0))
        state = newState
        ()
      }
      .start()

    // batch 1: keys 1..500; batch 2: 250..750 (half dupes); batch 3: all dupes
    stream.addData(1L to 500L: _*); query.processAllAvailable()
    val after1 = admitted.size
    stream.addData(250L to 750L: _*); query.processAllAvailable()
    val after2 = admitted.size
    stream.addData(1L to 750L: _*); query.processAllAvailable()
    query.stop()

    // no key admitted twice — the exact-guarantee side
    assert(admitted.size == admitted.toSet.size, "a duplicate was re-admitted")
    // batch 3 was all duplicates: nothing new admitted
    assert(admitted.size == after2)
    // novelty loss only at FPP: 2^20 bits / ≤750 keys → FPP ~1e-10;
    // allow a handful anyway
    assert(after1 >= 498, s"batch1 admitted $after1 of 500")
    assert(after2 - after1 >= 248, s"batch2 admitted ${after2 - after1} of 250 novel")
    // and every admitted key was genuinely first-seen in stream order
    assert(admitted.toSet.subsetOf((1L to 750L).toSet))
  }

  test("first-seen filter admits a key repeated WITHIN one micro-batch exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val stream = MemoryStream[Long]
    var state = new Array[Byte]((1 << 20) / 8)
    val admitted = collection.mutable.ArrayBuffer[Long]()

    val query = stream.toDS().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val (pass, newState) = Bloom.firstSeen(batch, "k", state)
        admitted ++= pass.collect().map(_.getLong(0))
        state = newState
        ()
      }
      .start()

    // one batch where every key appears 3 times
    val keys = 1L to 100L
    stream.addData(keys ++ keys ++ keys: _*); query.processAllAvailable()
    // then the same keys again across a batch boundary
    stream.addData(keys ++ keys: _*); query.processAllAvailable()
    query.stop()

    assert(admitted.size == admitted.toSet.size,
      "an intra-batch duplicate was admitted twice")
    assert(admitted.size >= 98 && admitted.size <= 100,
      s"expected ~100 singletons, got ${admitted.size}")
  }
}
