package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions.col

import graft._
import graft.operators.Ann

/** Per-PHASE shuffle bytes for the q203 composition (LSH-celled NSW):
  * index / build / search measured separately, at whatever SF
  * SPARK_GRAFT_SF_DIR points to — the attribution tool behind the r15
  * build-co-location fix (the all-in-one ShuffleAudit number cannot
  * say WHICH phase ships vectors).
  */
object NswShufProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shufW = new AtomicLong; val shufRec = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def phase[A](name: String)(body: => A): A = {
      Thread.sleep(1500); shufW.set(0); shufRec.set(0)
      val t0 = System.nanoTime
      val r = body
      Thread.sleep(1500)
      println(f"[nsw-shuf] $name%-8s mb=${shufW.get / 1048576.0}%.1f " +
        f"rows=${shufRec.get}%d sec=${(System.nanoTime - t0) / 1e9}%.1f")
      r
    }
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val twins = embs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val n = embs.count()
    // SPARK_GRAFT_NSW_BITS overrides the occupancy (r16): fewer bits =
    // denser cells at the SAME corpus — the saturation test for the
    // proposal-growth ceiling without needing the next decade's data
    val bits = sys.env.get("SPARK_GRAFT_NSW_BITS").map(_.toInt)
      .getOrElse(math.max(3, math.ceil(
        math.log(math.sqrt(n.toDouble)) / math.log(2)).toInt))
    val index = phase("index") {
      val i = Ann.nswLshIndex(embs, bits)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      i.count(); i
    }
    val edges = phase("build") {
      val e = Ann.nswBuild(index, kNbr = 12, rounds = 2).localCheckpoint()
      e.count(); e
    }
    phase("search") {
      Ann.nswSearchLsh(edges, index, Ann.nswEntriesSampled(index), twins,
        k = 5, nBits = bits, beam = 16, hops = 3).collect()
    }
    spark.stop()
  }
}
