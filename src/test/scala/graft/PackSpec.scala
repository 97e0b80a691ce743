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

  test("empty and whitespace-only docs count 1 token and land in exactly one shard") {
    // the n_tokens >= 1 invariant behind the sequence(first, last)
    // explode: a 0-token doc at a shard boundary would make the range
    // DESCEND (phantom rows in Spark, absent rows in the oracle)
    val docs = Seq((1L, ""), (2L, "   "), (3L, "a b c")).toDF("doc_id", "text")
    val placed = Pack.shardPlacement(docs, seqLen = 4, binsPerShard = 1, seed = 1L)
      .collect()
    val byDoc = placed.groupBy(_.getAs[Long]("doc_id"))
    for (id <- Seq(1L, 2L)) {
      assert(byDoc(id).length == 1, s"doc $id must touch exactly one shard")
      assert(byDoc(id).head.getAs[Long]("n_tokens") >= 1L)
      assert(byDoc(id).head.getAs[Long]("slice_len") == byDoc(id).head.getAs[Long]("n_tokens"))
    }
    assert(placed.forall(r => r.getAs[Long]("slice_len") > 0L))
  }

  test("writeShards lands one pruned directory per shard; read-back equals in-memory placement") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    try {
      Pack.writeShards(docs, dir)
      val mem = Pack.shardPlacement(docs)
      val shardDirs = new java.io.File(dir).listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("shard_id=")).map(_.getName)
      assert(shardDirs.length == mem.select("shard_id").distinct().count())
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("doc_id"), r.getAs[Number]("shard_id").longValue(),
          r.getAs[Long]("global_start"), r.getAs[Long]("slice_start"),
          r.getAs[Long]("slice_len"))
      val back = spark.read.parquet(dir)
      assert(back.collect().map(key).sorted.toSeq ==
        mem.collect().map(key).sorted.toSeq)
      // the read-path contract: a single-shard read prunes partitions
      val plan = back.filter(col("shard_id") === 0)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(shard_id"),
        s"no partition filter in:\n$plan")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("trainer round-trip: each shard reads back as one contiguous token run; docs reassemble exactly") {
    // the consumer protocol writeShards promises: a trainer opens ONE
    // shard directory, sorts its slices by absolute token position, and
    // gets the shard's full token interval with no gap, overlap, or
    // seek into another shard; across shards the intervals concatenate
    // to exactly the corpus, and every document's slices reassemble to
    // exactly its token count.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_rt").toString
    try {
      val (seqLen, bps) = (64, 4)
      val st = bps.toLong * seqLen
      Pack.writeShards(docs, dir, seqLen = seqLen, binsPerShard = bps, seed = 42L)
      val nTok = docs.select(col("doc_id"),
          size(graft.functions.Text.words(col("text"))).cast("long").as("n"))
        .as[(Long, Long)].collect().toMap
      val corpusTokens = nTok.values.sum
      val shardIds = new java.io.File(dir).listFiles
        .filter(_.getName.startsWith("shard_id="))
        .map(_.getName.stripPrefix("shard_id=").toLong).sorted.toSeq
      assert(shardIds == (0L until shardIds.length), s"shard ids not dense: $shardIds")
      var total = 0L
      for (sid <- shardIds) {
        // the trainer's read is ONLY this shard's directory
        val slices = spark.read.parquet(s"$dir/shard_id=$sid")
          .select((col("global_start") + col("slice_start")).as("abs_start"),
            col("slice_len"))
          .as[(Long, Long)].collect().sortBy(_._1)
        var pos = sid * st
        for ((start, len) <- slices) {
          assert(start == pos, s"shard $sid: gap/overlap at token $pos (next slice $start)")
          pos += len
        }
        val expectedEnd = math.min((sid + 1) * st, corpusTokens)
        assert(pos == expectedEnd, s"shard $sid ends at $pos, interval end $expectedEnd")
        total += pos - sid * st
      }
      assert(total == corpusTokens, s"shards carry $total of $corpusTokens corpus tokens")
      // document reassembly across shard boundaries: slices tile [0, n)
      val byDoc = spark.read.parquet(dir)
        .select(col("doc_id"), col("slice_start"), col("slice_len"))
        .as[(Long, Long, Long)].collect().groupBy(_._1)
      assert(byDoc.keySet == nTok.keySet, "every document lands in some shard")
      for ((id, rows) <- byDoc) {
        var pos = 0L
        for ((_, s, l) <- rows.sortBy(_._2)) {
          assert(s == pos, s"doc $id: slice gap at in-doc offset $pos")
          pos += l
        }
        assert(pos == nTok(id), s"doc $id reassembles to $pos of ${nTok(id)} tokens")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("incremental append placement stays dense across micro-batches and conserves tokens") {
    import java.sql.Timestamp
    implicit val sq = spark.sqlContext
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .orderBy("doc_id").limit(30)
      .select("doc_id", "text").as[(Long, String)].collect()
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val batches = all.grouped(10).toSeq

    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    var base = 0L
    val placements = collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)] // (doc_id, shard_id, global_start, slice_len)
    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val docs = batch.select("doc_id", "text")
        val placed = Pack.shardPlacement(docs, seqLen = 64, binsPerShard = 4,
          seed = 42L, baseTokens = base).collect()
        placements ++= placed.map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("shard_id"), r.getAs[Long]("global_start"),
          r.getAs[Long]("slice_len")))
        base += placed.filter(r =>
            r.getAs[Long]("first_shard") == r.getAs[Long]("shard_id"))
          .map(_.getAs[Long]("n_tokens")).sum
        ()
      }.start()
    try {
      batches.foreach { b =>
        stream.addData(b.map { case (id, tx) => Doc(id, tx, t0) })
        query.processAllAvailable()
      }
    } finally query.stop()

    // serial replay: within each batch the seeded hash order, batches
    // appended in arrival order — offsets must be dense over the whole
    // stream and the sliced token mass must equal the corpus total.
    // Token counts come from the operator's OWN tokenizer (one Spark
    // lookup), so the replay checks ORDER and DENSITY, not a parallel
    // re-implementation of text normalization.
    val nTok = all.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"),
        size(graft.functions.Text.words(col("text"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val p = 2147483647L
    var expectStart = 0L
    val starts = placements.map(x => (x._1, x._3)).toSet // distinct (doc, start)
    batches.foreach { b =>
      b.map { case (id, _) => ((((id % p) * 2654435761L + 42L) % p), id) }
        .sortBy(identity).foreach { case (_, id) =>
          assert(starts.contains((id, expectStart)),
            s"doc $id expected at offset $expectStart")
          expectStart += nTok(id)
        }
    }
    val sliceMass = placements.map(_._4).sum
    assert(sliceMass == expectStart, "sliced token mass must equal the stream total")
  }

  test("the data-sized window is partition-parallel; only partition totals hit the global window") {
    val rows = (1 to 10000).map(i => (i.toLong, 3L)).toDF("doc_id", "n")
    val plan = Pack.globalOffsets(rows, "doc_id", "n")
      .queryExecution.executedPlan.toString
    // the corpus-sized running sum must be keyed by SPARK_PARTITION_ID —
    // an un-partitioned data-sized window would single-thread the corpus
    assert(plan.contains("SPARK_PARTITION_ID"), s"expected pid-partitioned window:\n$plan")
  }

  test("pre-counted face == text face: shardManifestCounted over derived counts is identical") {
    // pins the q190 refactor: shardPlacement is now a thin wrapper over
    // shardPlacementCounted, so the two manifest faces must be
    // row-identical on the same corpus and knobs
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val counted = docs.select(col("doc_id"),
      size(graft.functions.Text.words(col("text"))).cast("long").as("n_tokens"))
    val fromText = Pack.shardManifest(docs, seqLen = 256, binsPerShard = 8, seed = 11L)
      .orderBy("shard_id").collect().toSeq
    val fromCounts = Pack
      .shardManifestCounted(counted, seqLen = 256, binsPerShard = 8, seed = 11L)
      .orderBy("shard_id").collect().toSeq
    assert(fromText == fromCounts)
  }

  test("orderPrefix curriculum: every band-0 token lays out before band 1, shuffled within band") {
    val rnd = new scala.util.Random(11)
    val counted = (1 to 60).map(i =>
      (i.toLong, 1L + rnd.nextInt(20), (i % 2).toLong))
      .toDF("doc_id", "n_tokens", "band_rank")
    val placed = Pack.shardPlacementCounted(counted, seqLen = 8,
        binsPerShard = 2, seed = 5L, orderPrefix = Seq("band_rank"))
      .select("doc_id", "global_start", "n_tokens").distinct()
      .join(counted.select("doc_id", "band_rank"), "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    val (b0, b1) = placed.partition(_._4 == 0L)
    assert(b0.nonEmpty && b1.nonEmpty)
    val b0End = b0.map(r => r._2 + r._3).max
    val b1Start = b1.map(_._2).min
    assert(b0End <= b1Start,
      s"band 0 must end ($b0End) before band 1 begins ($b1Start)")
    // dense across the band boundary too
    assert(b0End == b1Start, "no gap at the band boundary")
    // within a band the seeded shuffle still decorrelates: band-0 docs
    // are NOT laid out in doc_id order
    val b0ByStart = b0.sortBy(_._2).map(_._1).toSeq
    assert(b0ByStart != b0ByStart.sorted, "shuffle within band must apply")
    // a CONSTANT prefix degrades to the default layout exactly
    val flat = counted.withColumn("band_rank", lit(0L))
    val withPrefix = Pack.shardPlacementCounted(flat, seqLen = 8,
        binsPerShard = 2, seed = 5L, orderPrefix = Seq("band_rank"))
      .select("doc_id", "shard_id", "global_start", "slice_start", "slice_len")
      .collect().map(_.toSeq).toSet
    val plain = Pack.shardPlacementCounted(counted.drop("band_rank"), seqLen = 8,
        binsPerShard = 2, seed = 5L)
      .select("doc_id", "shard_id", "global_start", "slice_start", "slice_len")
      .collect().map(_.toSeq).toSet
    assert(withPrefix == plain)
  }

  test("corpus build composition is invariant to input partitioning (seeded random)") {
    // the q190 shape end-to-end THROUGH the production faces (Mix.keep,
    // not a re-implementation of its hash/predicate): the keep decision
    // is per-row deterministic and the packer's (h, doc_id) order is
    // global, so 1/7/32-partition inputs must produce the byte-identical
    // manifest
    val rnd = new scala.util.Random(17)
    val langs = Array("en", "zh", "de", "es", "fr")
    val rows = (1L to 4000L).map { i =>
      val toks = 1 + rnd.nextInt(60)
      (i, langs(rnd.nextInt(langs.length)), Seq.fill(toks)("w").mkString(" "))
    }
    val manifests = Seq(1, 7, 32).map { parts =>
      val docs = rows.toDF("doc_id", "lang", "text").repartition(parts)
      val kept = graft.operators.Mix.keep(docs, budgetTokens = 30000L)
        .select(col("doc_id"), col("toks").as("n_tokens"))
      Pack.shardManifestCounted(kept, seqLen = 128, binsPerShard = 4, seed = 7L)
        .orderBy("shard_id").collect().toSeq
    }
    assert(manifests(0).nonEmpty)
    assert(manifests(0) == manifests(1) && manifests(1) == manifests(2),
      "manifest must not depend on input partitioning")
  }

  test("corpus build composition: the manifest packs exactly the mix's kept tokens") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kept = graft.operators.Mix.keep(docs, budgetTokens = 30000L)
    val keptRows = kept.select("doc_id", "toks").as[(Long, Long)].collect()
    // the draw is content-independent and deterministic: a re-run
    // selects the identical document set
    val again = graft.operators.Mix.keep(docs, budgetTokens = 30000L)
      .select("doc_id", "toks").as[(Long, Long)].collect()
    assert(keptRows.toSet == again.toSet, "mix selection must be deterministic")
    // per-language kept tokens can never exceed availability
    val byLang = kept.groupBy("lang")
      .agg(sum(col("toks")).as("got"), max(col("avail")).as("avail"))
      .as[(String, Long, Long)].collect()
    byLang.foreach { case (lang, got, avail) =>
      assert(got <= avail, s"$lang kept $got > available $avail")
    }
    val manifest = Pack.shardManifestCounted(
      kept.select(col("doc_id"), col("toks").as("n_tokens")),
      seqLen = 512, binsPerShard = 4, seed = 7L).collect()
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum == keptRows.map(_._2).sum,
      "the shard plan must conserve exactly the sampled corpus's tokens")
    assert(manifest.map(_.getAs[Long]("n_docs_starting")).sum == keptRows.length,
      "every kept document starts in exactly one shard")
  }
}
