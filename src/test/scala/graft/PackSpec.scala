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

  test("shard manifest conserves tokens and docs exactly; full shards hold exactly their capacity") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val totalTokens = docs
      .select(sum(size(graft.functions.Text.words(col("text"))).cast("long")))
      .as[Long].head()
    val m = Pack.shardManifest(docs, seqLen = 512, binsPerShard = 16, seed = 42L)
      .collect()
    assert(m.map(_.getAs[Long]("n_tokens")).sum == totalTokens,
      "token mass must be conserved across shards (straddlers split exactly)")
    assert(m.map(_.getAs[Long]("n_docs_starting")).sum == docs.count(),
      "every document starts in exactly one shard")
    val byId = m.sortBy(_.getAs[Long]("shard_id"))
    assert(byId.map(_.getAs[Long]("shard_id")).toSeq ==
      (0L until m.length).toSeq, "shard ids must be contiguous from 0")
    // dense packing: every shard but the last is exactly full
    byId.init.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == 16L * 512,
        s"shard ${r.getAs[Long]("shard_id")} not full")
    }
    byId.foreach { r =>
      assert(r.getAs[Long]("first_bin") == r.getAs[Long]("shard_id") * 16)
      assert(r.getAs[Long]("last_bin") < (r.getAs[Long]("shard_id") + 1) * 16)
    }
  }

  test("shard manifest replays the serial seeded-shuffle layout, under any partitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val counted = docs.select(col("doc_id"),
        size(graft.functions.Text.words(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect()
    // serial reference: Knuth key, order by (h, doc_id), pack, manifest
    val p = 2147483647L
    val ordered = counted
      .map { case (id, n) => (((id % p) * 2654435761L + 42L) % p, id, n) }
      .sortBy(t => (t._1, t._2))
    val st = 16L * 512
    var gs = 0L
    val agg = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    ordered.foreach { case (_, _, n) =>
      val first = gs / st; val last = (gs + n - 1) / st
      (first to last).foreach { s =>
        val tok = math.min(gs + n, (s + 1) * st) - math.max(gs, s * st)
        val (ds, dt, tk) = agg.getOrElse(s, (0L, 0L, 0L))
        agg(s) = (ds + (if (s == first) 1L else 0L), dt + 1L, tk + tok)
      }
      gs += n
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = Pack.shardManifest(docs.repartition(parts), seqLen = 512,
          binsPerShard = 16, seed = 42L).collect()
        .map(r => r.getAs[Long]("shard_id") ->
          (r.getAs[Long]("n_docs_starting"), r.getAs[Long]("n_docs_touching"),
            r.getAs[Long]("n_tokens"))).toMap
      assert(got == agg.toMap, s"parts=$parts: manifest diverges from serial replay")
    }
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
