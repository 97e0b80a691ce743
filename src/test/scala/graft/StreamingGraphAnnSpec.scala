package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Incremental graph-ANN ingestion (Ann.nswInsert — the DiskANN
  * insertion recipe over the accumulated index/edge tables, through
  * foreachBatch like the minhash/SemDeDup loops): batches of vectors
  * arrive, each batch walks the existing graph for its neighbors and
  * links in; a later query must find near-dups among EARLIER streamed
  * vectors against the accumulated state.
  */
class StreamingGraphAnnSpec extends SparkSpec {

  test("compaction restores the fresh-build graph: edge-set equality, recall parity, bytes bound") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nBits = 4
    val index0 = Ann.nswLshIndex(base, nBits).localCheckpoint()
    val edges0 = Ann.nswBuild(index0, kNbr = 8, rounds = 2).localCheckpoint()
    // two appended segments through the ingestion face: batch 1 novel
    // ids (2M+), batch 2 twins of batch 1 (3M+) — the accumulated edge
    // table now carries two batch ring spines + cross-cell walk links
    // a fresh build would never produce
    val b1 = base.filter(col("vec_id") < 6)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val b2 = base.filter(col("vec_id") < 6)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
    val (i1, e1) = Ann.nswInsert(b1, index0, edges0, nBits, kNbr = 8)
    val (i2a, e2a) = Ann.nswInsert(b2, i1.localCheckpoint(), e1.localCheckpoint(), nBits, kNbr = 8)
    val accIndex = i2a.localCheckpoint()
    val accEdges = e2a.localCheckpoint()
    val newIds = b1.unionByName(b2).select("vec_id")
    val compacted = Ann.nswCompact(accIndex, accEdges, newIds,
      kNbr = 8, rounds = 2).localCheckpoint()
    // the law: rebuilt touched cells + kept untouched build edges ==
    // the fresh whole-corpus build, EXACTLY (cell-local deterministic
    // build; LSH bucket assignment identical on the accumulated index)
    val fresh = Ann.nswBuild(accIndex, kNbr = 8, rounds = 2)
    def eset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cs = eset(compacted)
    val fs = eset(fresh)
    assert(cs == fs,
      s"compacted != fresh: only-compacted=${(cs -- fs).take(5)} only-fresh=${(fs -- cs).take(5)}")
    // bytes bound: ingestion history's extra links are gone
    assert(cs.size <= accEdges.count(),
      s"compacted ${cs.size} edges > accumulated ${accEdges.count()}")
    // recall parity on planted twins: a 3M+ query still fills ranks 1-2
    // with its two exact copies through the COMPACTED graph
    val top2 = Ann.nswSearchLsh(compacted, accIndex,
        Ann.nswEntriesSampled(accIndex), b2, k = 3, nBits = nBits)
      .filter(col("rn") <= 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    for (i <- 0L until 6L) {
      val rows = top2.getOrElse(i + 3000000L, Array.empty)
      assert(rows.map(_._2).toSet == Set(i, i + 2000000L),
        s"query ${i + 3000000L}: expected both copies post-compaction, got ${rows.toSeq}")
      assert(rows.forall(_._3 == 1.0), rows.toSeq.toString)
    }
  }

  test("streamed inserts accumulate: a twin of an earlier batch's vector is found") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val nBits = 4
    // bootstrap graph on the base corpus
    var index: DataFrame = Ann.nswLshIndex(base, nBits).localCheckpoint()
    var edges: DataFrame = Ann.nswBuild(index, kNbr = 8, rounds = 2)
      .localCheckpoint()

    // two arriving batches: batch 1 is novel vectors (ids 2M+), batch 2
    // contains exact twins of BATCH-1 vectors (ids 3M+) — finding them
    // requires the accumulated graph, not the bootstrap corpus
    val b1 = base.filter(col("vec_id") < 6)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
    val b2 = base.filter(col("vec_id") < 6)
      .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val query = stream.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val (i2, e2) = Ann.nswInsert(b.toDF(), index, edges, nBits, kNbr = 8)
        index = i2.localCheckpoint()
        edges = e2.localCheckpoint()
        ()
      }
      .start()
    try {
      for (b <- Seq(b1, b2)) {
        stream.addData(b.collect().map(r =>
          (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq)
        query.processAllAvailable()
      }
    } finally query.stop()

    // search twins of batch-1 ids against the accumulated graph: each
    // 3M+ query has TWO exact copies present — the base vector (in the
    // bootstrap build) and the 2M+ batch-1 arrival (reachable ONLY via
    // inserted links). Both must fill ranks 1-2 at sim 1.0; finding the
    // 2M+ copy is the accumulated-graph property under test
    val queries = b2
    val top2 = Ann.nswSearchLsh(edges, index, Ann.nswEntriesSampled(index),
        queries, k = 3, nBits = nBits)
      .filter(col("rn") <= 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    for (i <- 0L until 6L) {
      val rows = top2.getOrElse(i + 3000000L, Array.empty)
      val cids = rows.map(_._2).toSet
      assert(cids == Set(i, i + 2000000L),
        s"query ${i + 3000000L}: expected both exact copies in ranks 1-2, got ${rows.toSeq}")
      assert(rows.forall(_._3 == 1.0), rows.toSeq.toString)
    }
  }
}
