package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** A/B allocation probe: run the ANN training path N times, report GC
  * time and allocated bytes (driver JVM).
  */
object GcProbe {
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.Tables.embeddings(spark, sfDir)
    // warm
    Ann.pqFit(embs, m = 16, ksub = 16, iters = 2, trainMod = 1)
    System.gc(); Thread.sleep(300)
    val g0 = gcMillis
    val t0 = System.nanoTime()
    for (_ <- 1 to 5) {
      Ann.pqFit(embs, m = 16, ksub = 16, iters = 2, trainMod = 1)
      Ann.ivfFit(embs, c = 16, iters = 2, trainMod = 1)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"TRAIN5: ${secs}%.2f s, gc=${gcMillis - g0} ms")
    spark.stop()
  }
}
