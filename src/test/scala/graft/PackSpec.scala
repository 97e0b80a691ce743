package graft

import org.apache.spark.sql.functions._

import graft.operators.Pack

/** Laws of the distributed global prefix sum + sequence packing
  * (operators/Pack.scala):
  *  - offsets are dense and contiguous in the order column;
  *  - the result is invariant to the input's partitioning;
  *  - packing arithmetic tiles bins exactly (no gaps, no overlaps);
  *  - the data-sized window is partition-parallel (the un-partitioned
  *    window sees only per-partition totals).
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  test("global offsets are the exact serial prefix sum, under any input partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 5000).map(i => (i.toLong, 1L + rnd.nextInt(200)))
    val expected = rows.scanLeft(0L)(_ + _._2).init // serial prefix sum
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("doc_id", "n").repartition(parts)
      val got = Pack.globalOffsets(df, "doc_id", "n")
        .orderBy("doc_id").select("global_start").as[Long].collect()
      assert(got.toSeq == expected, s"parts=$parts: offsets diverge from serial scan")
    }
  }

  test("packing tiles bins exactly: contiguous, gap-free, spans consistent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val packed = Pack.packSequences(docs, seqLen = 512).collect().sortBy(_.getAs[Long]("global_start"))
    var next = 0L
    packed.foreach { r =>
      assert(r.getAs[Long]("global_start") == next, "offsets not contiguous")
      assert(r.getAs[Long]("bin") == next / 512 && r.getAs[Long]("offset") == next % 512)
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("bins_spanned") == (next + n - 1) / 512 - next / 512 + 1)
      next += n
    }
    assert(next == packed.map(_.getAs[Long]("n_tokens")).sum)
  }

  test("the data-sized window is partition-parallel; only partition totals hit the global window") {
    val rows = (1 to 10000).map(i => (i.toLong, 3L)).toDF("doc_id", "n")
    val plan = Pack.globalOffsets(rows, "doc_id", "n")
      .queryExecution.executedPlan.toString
    // the corpus-sized running sum must be keyed by SPARK_PARTITION_ID —
    // an un-partitioned data-sized window would single-thread the corpus
    assert(plan.contains("SPARK_PARTITION_ID"), s"expected pid-partitioned window:\n$plan")
  }
}
