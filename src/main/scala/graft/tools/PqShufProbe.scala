package graft.tools
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions.col
import graft._
import graft.operators.Ann
object PqShufProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shufW = new AtomicLong; val shufRec = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) { shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten); shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten) }
      }
    })
    def meas(name: String, clear: Boolean = true)(body: => Unit): Unit = {
      if (clear) spark.catalog.clearCache()
      Thread.sleep(400); shufW.set(0); shufRec.set(0)
      body; Thread.sleep(1500)
      println(f"[decomp] $name%-12s mb=${shufW.get/1048576.0}%.2f rows=${shufRec.get}%d")
    }
    val embs = Tables.embeddings(spark, d)
    val nat = embs.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
    var cents: Seq[(Int, Int, Seq[Double])] = null
    meas("pqFit") { cents = Ann.pqFit(embs, m = 32, ksub = 16, iters = 2, trainMod = 4) }
    var index: org.apache.spark.sql.DataFrame = null
    meas("pqEncode") { index = Ann.pqEncode(embs, cents, m = 32); index.write.format("noop").mode("overwrite").save() }
    val idx = Ann.pqEncode(embs, cents, m = 32).persist()
    idx.count()
    Thread.sleep(500)
    meas("pqSearch", clear = false) { Ann.pqSearch(cents, idx, nat, k = 5).write.format("noop").mode("overwrite").save() }
    val idx2 = Ann.pqEncode(embs, cents, m = 32).repartition(col("vec_id")).persist()
    idx2.count()
    Thread.sleep(500)
    meas("pqSearchCo", clear = false) { Ann.pqSearch(cents, idx2, nat, k = 5).write.format("noop").mode("overwrite").save() }
    // per-stage attribution for the co-located search
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = {
        val m = st.stageInfo.taskMetrics
        if (m != null && m.shuffleWriteMetrics.recordsWritten > 0)
          println(s"[stage] ${st.stageInfo.stageId} rows=${m.shuffleWriteMetrics.recordsWritten} " +
            s"bytes=${m.shuffleWriteMetrics.bytesWritten} name=${st.stageInfo.name.take(60)}")
      }
    })
    Ann.pqSearch(cents, idx2, nat, k = 5).write.format("noop").mode("overwrite").save()
    Thread.sleep(2000)
    spark.stop()
  }
}
