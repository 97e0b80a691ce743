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
}
