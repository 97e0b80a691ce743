package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft._

/** Throwaway diagnostic: per-stage shuffle bytes of serial vs batched
  * BPE training (the r12 shuffle-gate investigation).
  */
object BpeShufProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null && m.shuffleWriteMetrics.bytesWritten > 0)
          stages.synchronized {
            stages += ((s.stageInfo.stageId, m.shuffleWriteMetrics.bytesWritten,
              m.shuffleWriteMetrics.recordsWritten, s.stageInfo.name.take(70)))
          }
      }
    })
    def run(label: String)(f: => Unit): Unit = {
      stages.synchronized(stages.clear())
      f
      Thread.sleep(2000)
      println(s"== $label")
      stages.synchronized {
        stages.foreach { case (id, b, r, n) =>
          println(f"  stage $id%4d ${b / 1024.0}%10.1f KB $r%9d rows  $n")
        }
        println(f"  total ${stages.map(_._2).sum / 1048576.0}%.2f MB")
      }
    }
    run("serial") {
      graft.operators.Bpe.trainMerges(Tables.documents(spark, d), 6).collect()
    }
    spark.catalog.clearCache()
    run("batched") {
      graft.operators.Bpe.trainMergesBatched(Tables.documents(spark, d), 6, 3).collect()
    }
    spark.stop()
  }
}
