package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Mix, Pack}

/** The streaming corpus-build loop (q190's ingestion face): calibrate
  * per-language availability ONCE (the q189 learnThreshold posture),
  * then gate each arriving micro-batch at the fixed exact-integer
  * rates and pack the survivors append-ordered after the tokens
  * already shipped (Pack.shardPlacementCounted's baseTokens face).
  */
case class MixDoc(doc_id: Long, lang: String, text: String)

class StreamingMixSpec extends SparkSpec {

  test("calibrate-once mix on the stream: kept set == batch keep; packing stays dense") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val rnd = new scala.util.Random(29)
    val langs = Array("en", "zh", "de", "es", "fr")
    val corpus = (1L to 120L).map { i =>
      val words = 3 + rnd.nextInt(40)
      MixDoc(i, langs(rnd.nextInt(langs.length)), Seq.fill(words)("w").mkString(" "))
    }
    val corpusDf = corpus.toDF()
    val budget = 1500L

    // batch face: the reference keep set
    val batchKept = Mix.keep(corpusDf, budgetTokens = budget)
      .select("doc_id", "toks").as[(Long, Long)].collect().toMap
    assert(batchKept.nonEmpty && batchKept.size < corpus.length,
      "the budget must actually bind for this test to mean anything")

    // calibrate ONCE on the full corpus (a deployment would use a
    // sample); the fixed table is what every micro-batch gates against
    val avail = Mix.availability(Mix.counted(corpusDf), budgetTokens = budget)
      .localCheckpoint()

    val stream = MemoryStream[MixDoc]
    val streamedKept = collection.mutable.Map[Long, Long]()
    val placements = collection.mutable.ArrayBuffer[(Long, Long, Long)]() // (doc, global_start, n_tokens)
    var baseTokens = 0L

    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val kept = Mix.keepAgainst(batch.toDF(), avail)
          .select(col("doc_id"), col("toks").as("n_tokens"))
          .localCheckpoint()
        val placed = Pack.shardPlacementCounted(kept, seqLen = 64,
          binsPerShard = 4, seed = 7L, baseTokens = baseTokens)
        placements ++= placed
          .select("doc_id", "global_start", "n_tokens").distinct()
          .as[(Long, Long, Long)].collect()
        streamedKept ++= kept.as[(Long, Long)].collect()
        baseTokens += kept.agg(coalesce(sum("n_tokens"), lit(0L))).as[Long].head()
        ()
      }
      .start()
    try {
      // arrivals split 3 ways, unaligned with doc ids
      corpus.grouped(47).foreach { g =>
        stream.addData(g)
        query.processAllAvailable()
      }
    } finally query.stop()

    assert(streamedKept.toMap == batchKept,
      "fixed calibration must make the streamed keep set equal the batch keep set")
    // append-ordered dense packing: offsets tile [0, total) exactly
    val byStart = placements.sortBy(_._2)
    var next = 0L
    byStart.foreach { case (doc, start, n) =>
      assert(start == next, s"doc $doc expected at offset $next, got $start")
      next += n
    }
    assert(next == batchKept.values.sum,
      "packed token mass must equal the kept corpus exactly")
  }

  test("temperature shares stream: calibrate alpha-availability once, kept set == batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val rnd = new scala.util.Random(37)
    val langs = Array("en", "zh", "de", "es", "fr")
    val corpus = (1L to 120L).map { i =>
      val words = 3 + rnd.nextInt(40)
      MixDoc(i, langs(rnd.nextInt(langs.length)), Seq.fill(words)("w").mkString(" "))
    }
    val corpusDf = corpus.toDF()
    val budget = 1500L

    val batchKept = Mix.keepTemperature(corpusDf, budgetTokens = budget)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKept.nonEmpty && batchKept.size < corpus.length,
      "the budget must actually bind for this test to mean anything")

    // the temperature availability table drops into the SAME keepAgainst
    // deployment face fixed-share mixing uses (want/avail columns)
    val avail = Mix.availabilityTemperature(Mix.counted(corpusDf), budget)
      .localCheckpoint()
    val stream = MemoryStream[MixDoc]
    val streamed = collection.mutable.Set[Long]()
    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        streamed ++= Mix.keepAgainst(batch.toDF(), avail)
          .select("doc_id").as[Long].collect()
        ()
      }
      .start()
    try {
      corpus.grouped(47).foreach { g =>
        stream.addData(g)
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(streamed.toSet == batchKept,
      "fixed alpha-calibration must make the streamed keep set equal the batch set")
  }

  test("a language missing from the calibrated table fails loudly, never drops silently") {
    import spark.implicits._
    val sample = Seq(MixDoc(1, "en", "a b c"), MixDoc(2, "de", "d e f")).toDF()
    val avail = Mix.availability(Mix.counted(sample), budgetTokens = 100L)
      .localCheckpoint()
    val batch = Seq(MixDoc(3, "fr", "x y z")).toDF()
    val e = intercept[Exception] {
      Mix.keepAgainst(batch, avail).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("missing from the calibrated availability"),
      s"expected the loud calibration failure, got: ${messages(e)}")
  }
}
