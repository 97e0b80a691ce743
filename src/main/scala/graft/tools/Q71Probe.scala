package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft._
import graft.operators.Ann

/** The q71 occupancy-knob measurement (r12): cosineDupPairs' candidate
  * volume is n²/2^nBits per probe orientation, so a FIXED nBits turns
  * super-linear as the corpus grows — this probe measures shuffle
  * bytes, candidate-pair output, and pair-set recall of nBits ∈
  * {4, 6, 8} at a given SF. Recall is against the nBits=4 pair set
  * (the oracled configuration): larger nBits trades recall at a fixed
  * 1-bit multi-probe for a 2^Δ candidate cut — the q62 banded-minhash
  * face is the high-recall alternative at scale.
  */
object Q71Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val shuf = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val embs = Tables.embeddings(spark, d)
    var base: Set[(Long, Long)] = Set.empty
    for (nBits <- Seq(4, 6, 8)) {
      spark.catalog.clearCache()
      Thread.sleep(500); shuf.set(0)
      val t0 = System.nanoTime()
      val pairs = Ann.cosineDupPairs(embs, threshold = 0.4, nBits = nBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      if (nBits == 4) base = pairs
      val recall = if (base.isEmpty) 1.0 else (base & pairs).size.toDouble / base.size
      println(f"[q71] nBits=$nBits pairs=${pairs.size}%d recall_vs_4=$recall%.3f " +
        f"shuffle_mb=${shuf.get / 1048576.0}%.1f secs=$secs%.1f")
    }
    spark.stop()
  }
}
