package graft

import org.apache.spark.sql.functions._

import graft.sources.Multimodal

/** Chunked binary decode: coverage (chunks tile the payload exactly),
  * batch-shape independence, and partition invariance.
  */
class MultimodalSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 50)

  test("chunks tile each payload exactly: sizes sum to byte length") {
    val perDoc = Multimodal.chunkDecode(spark, docs).toDF()
      .groupBy("doc_id")
      .agg(sum("n_chunk_bytes").as("total"), max("n_chunks").as("nc"),
        count(lit(1)).as("rows"))
    val expected = docs.select(col("doc_id"),
      octet_length(col("text").cast("binary")).as("n"))
    val joined = perDoc.join(expected, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (total, nc, rows, n) = (r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4))
      assert(total === n.toLong, s"doc ${r.getLong(0)}: chunks cover $total of $n bytes")
      assert(nc.toLong === rows && nc === math.max(1, (n + 31) / 32))
    }
  }

  test("chunk rows are invariant to batch size and partitioning") {
    def rows(parts: Int, batch: Int) =
      Multimodal.chunkDecode(spark, docs.repartition(parts), batchSize = batch)
        .collect().sortBy(r => (r.doc_id, r.chunk_idx)).toSeq
    assert(rows(1, 7) === rows(16, 64))
  }
}
