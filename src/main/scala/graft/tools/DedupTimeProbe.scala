package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.operators.Dedup

/** Diagnostic: stage-by-stage wall time of the q189 learned-threshold
  * composition vs its q155 calibration core — where does the
  * deployment face spend time the report does not?
  */
object DedupTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dedup-time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    // warm the session on an unrelated query
    spark.read.parquet(s"$d/documents.parquet").count()

    t("q155-shaped sweep total") {
      val docs = Tables.documents(spark, d)
      val sweep = Dedup.calibrationSweep(
        Dedup.jaccardPairs(docs, threshold = 0.3),
        Dedup.minhashCandidates(docs, minEstJaccard = 0.25))
      sweep.collect().length
    }
    spark.catalog.clearCache()
    t("q189 learnedThresholdPairs") {
      val docs = Tables.documents(spark, d)
      Dedup.learnedThresholdPairs(docs).collect().length
    }
    spark.catalog.clearCache()
    // the q189 pieces, separately
    val docs = Tables.documents(spark, d)
    val cands = t("  minhashCandidates") { Dedup.minhashCandidates(docs, minEstJaccard = 0.25) }
    val truth = t("  jaccardPairs") { Dedup.jaccardPairs(docs, threshold = 0.3) }
    t("  sweep.collect") { Dedup.calibrationSweep(truth, cands).collect().length }
    t("  filter+materialize") {
      val out = cands.filter(round(col("est_jaccard") * 1000000).cast("long") >= 10 * 50000L)
      out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    }
    spark.stop()
  }
}
