package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Report

/** The live corpus dashboard (q199's ingestion face): each arriving
  * micro-batch folds its thin partials into the accumulated state
  * (count/sum/min/max merges — associative and commutative), and the
  * card finalizes from state on demand. Every merged quantity is an
  * int64 or an order-free min/max and the mean finalizes from integer
  * units, so the streamed card equals the batch card EXACTLY.
  */
case class RepDoc(doc_id: Long, source: String, lang: String, text: String)

class StreamingReportSpec extends SparkSpec {

  test("streamed report card == batch card, exactly, across arrival splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val rnd = new scala.util.Random(41)
    val sources = Array("web", "books", "code")
    val langs = Array("en", "de", "fr")
    val corpus = (1L to 90L).map { i =>
      val words = (1 to 3 + rnd.nextInt(20)).map(j => s"w${rnd.nextInt(40)}")
      // plant exact dups: every 9th doc repeats a fixed text
      val text = if (i % 9 == 0) "the repeated corpus boilerplate text"
        else words.mkString(" ")
      RepDoc(i, sources((i % 3).toInt), langs(rnd.nextInt(3)), text)
    }
    val corpusDf = corpus.toDF()
    val batchCard = Report.card(Report.thin(corpusDf).localCheckpoint())
      .orderBy("source").collect().map(_.toSeq)
    assert(batchCard.nonEmpty)
    assert(batchCard.exists(r => r(5).asInstanceOf[Long] > 0),
      "planted dups must register for this test to mean anything")

    val stream = MemoryStream[RepDoc]
    var src: DataFrame = null; var lng: DataFrame = null; var hsh: DataFrame = null
    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val thin = Report.thin(batch.toDF()).localCheckpoint()
        val (s2, l2, h2) = (Report.srcPartials(thin),
          Report.langPartials(thin), Report.hashPartials(thin))
        src = (if (src == null) s2 else Report.mergeSrc(src, s2)).localCheckpoint()
        lng = (if (lng == null) l2 else Report.mergeLang(lng, l2)).localCheckpoint()
        hsh = (if (hsh == null) h2 else Report.mergeHash(hsh, h2)).localCheckpoint()
        ()
      }
      .start()
    try {
      corpus.grouped(37).foreach { g =>
        stream.addData(g)
        query.processAllAvailable()
      }
    } finally query.stop()

    val streamedCard = Report.card(src, lng, hsh)
      .orderBy("source").collect().map(_.toSeq)
    assert(streamedCard.toSeq == batchCard.toSeq,
      s"stream:\n${streamedCard.mkString("\n")}\nbatch:\n${batchCard.mkString("\n")}")
  }

  test("streamed corpusDiff == batch diff, exactly, across arrival splits") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // OLD snapshot: 60 docs; NEW snapshot: every 10th removed, every
    // 7th revised, 6 fresh arrivals under a new source — the q219 shape
    val old = (1L to 60L).map(i =>
      RepDoc(i, s"src${i % 3}", "en", s"alpha beta doc $i words"))
    val neu = old.filter(_.doc_id % 10 != 0).map(d =>
      if (d.doc_id % 7 == 0) d.copy(text = d.text + " revised") else d) ++
      (101L to 106L).map(i => RepDoc(i, "srcNEW", "en", s"fresh arrival $i"))
    val batchDiff = Report.corpusDiff(old.toDF(), neu.toDF())
      .orderBy("source").collect().map(_.toSeq)
    assert(batchDiff.exists(r => r(3).asInstanceOf[Long] > 0),
      "planted revisions must register as changed")

    // the savingsFromState posture: the OLD snapshot's thin state is
    // the accumulated corpus; NEW-snapshot batches fold in as they
    // arrive (union — each doc_id once per snapshot by contract) and
    // the diff finalizes from state on demand
    val oldThin = Report.diffThin(old.toDF()).localCheckpoint()
    val stream = MemoryStream[RepDoc]
    var newThin: DataFrame = null
    val query = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val t = Report.diffThin(batch.toDF()).localCheckpoint()
        newThin = (if (newThin == null) t else newThin.unionByName(t))
          .localCheckpoint()
        ()
      }
      .start()
    try {
      neu.grouped(23).foreach { g =>
        stream.addData(g)
        query.processAllAvailable()
      }
    } finally query.stop()
    val streamedDiff = Report.corpusDiffFromState(oldThin, newThin)
      .orderBy("source").collect().map(_.toSeq)
    assert(streamedDiff.toSeq == batchDiff.toSeq,
      s"stream:\n${streamedDiff.mkString("\n")}\nbatch:\n${batchDiff.mkString("\n")}")
  }
}
