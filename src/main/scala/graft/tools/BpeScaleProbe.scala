package graft.tools

import graft._

/** Diagnostic: serial vs batched BPE training on the REAL documents
  * corpus at merge counts well beyond the oracled k=6 — the
  * measurement behind SURVEY's "a real 32k-merge vocabulary is
  * reachable on the training path" claim. Prints driver-job counts,
  * wall seconds, and asserts the merge lists are row-identical
  * (the trainMergesBatched equivalence argument, checked on natural
  * pair statistics rather than BpeSpec's constructed corpora).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.BpeScaleProbe [rounds] [batch...]
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sc = spark.sparkContext
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = args.headOption.map(_.toInt).getOrElse(128)
    val batches = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 32)
    val docs = Tables.documents(spark, d)

    def timed(group: String)(body: => Array[org.apache.spark.sql.Row])
        : (Array[org.apache.spark.sql.Row], Int, Double) = {
      spark.catalog.clearCache()
      sc.setJobGroup(group, group, interruptOnCancel = false)
      val t0 = System.nanoTime()
      val out = try body finally sc.clearJobGroup()
      val secs = (System.nanoTime() - t0) / 1e9
      val jobs = sc.statusTracker.getJobIdsForGroup(group).length
      (out, jobs, secs)
    }

    val (serial, sJobs, sSecs) = timed("serial") {
      graft.operators.Bpe.trainMerges(docs, rounds).collect()
    }
    println(f"[bpe-scale] serial   rounds=${serial.length}%5d jobs=$sJobs%5d wall=$sSecs%7.1fs jobs/merge=${sJobs.toDouble / serial.length}%.2f")
    for (b <- batches) {
      val (got, bJobs, bSecs) = timed(s"batched-$b") {
        graft.operators.Bpe.trainMergesBatched(docs, rounds, batch = b).collect()
      }
      val same = got.length == serial.length &&
        got.zip(serial).forall { case (a, s) => a == s }
      println(f"[bpe-scale] batch=$b%3d rounds=${got.length}%5d jobs=$bJobs%5d wall=$bSecs%7.1fs jobs/merge=${bJobs.toDouble / got.length}%.2f speedup=${sSecs / bSecs}%.2fx identical=$same")
      if (!same) {
        got.zip(serial).zipWithIndex.filter { case ((a, s), _) => a != s }
          .take(3).foreach { case ((a, s), i) =>
            println(s"[bpe-scale]   DIVERGED at round ${i + 1}: batched=$a serial=$s")
          }
        sys.exit(1)
      }
    }
    spark.stop()
  }
}
