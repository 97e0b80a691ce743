package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft._

/** Stage-level profiler: run named queries (args) with a listener that
  * prints per-stage wall time, task count, and summed task time —
  * the tool that found the single-row-group starvation and the
  * interpreted-lambda hot spots (SURVEY.md §6).
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.get - si.submissionTime.get) / 1e3
        val cpu = si.taskMetrics.executorRunTime / 1e3
        println(f"[stg] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"wall=$wall%6.2f s taskTime=$cpu%7.2f s  ${si.name.takeWhile(_ != '(')}")
      }
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("q62_dedup_minhash")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"[total] $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
