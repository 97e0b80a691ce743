package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft._

/** Stage-level timing for one q62 execution. */
object ProfQ62 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.get - si.submissionTime.get) / 1e3
        val cpu = si.taskMetrics.executorRunTime / 1e3
        println(f"[stg] id=${si.stageId}%3d tasks=${si.numTasks}%3d wall=$wall%6.2f s taskTime=$cpu%7.2f s  ${si.name.takeWhile(_ != '(')} ${si.details.linesIterator.find(_.contains("graft")).getOrElse("").trim.take(80)}")
      }
    })
    val fn = SparkEntry.queries("q62_dedup_minhash")
    val t0 = System.nanoTime()
    fn(spark, d).count()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
