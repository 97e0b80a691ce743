package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Deployment-path latency probe: time the ANN SEARCH phase alone over
  * prebuilt (persisted-and-reloaded) model + index artifacts — the
  * number a deployment pays per query batch, vs the inline
  * fit∘encode∘search composition the bench times (q87/q138/q142).
  * Parquet round-trip included so the measured path is the reload one
  * AnnIndexSpec pins as training-free.
  */
object SearchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.Tables.embeddings(spark, sfDir)
    val queries = embs.filter(pmod(col("vec_id"), lit(200)) === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val dirPath = java.nio.file.Files.createTempDirectory("graft_ann")
    val dir = dirPath.toString

    try {
      // fit + encode once (untimed), persist all artifacts
      val (coarse, pqCents) = Ann.ivfPqFit(embs, c = 8, m = 16, trainMod = 4)
      Ann.ivfModelDf(spark, coarse).write.parquet(s"$dir/coarse")
      Ann.pqModelDf(spark, pqCents).write.parquet(s"$dir/pq")
      Ann.ivfPqEncode(embs, coarse, pqCents).write.parquet(s"$dir/index")

      // reload; search twice, report both (run 1 carries codegen warmup).
      // excludeSelf = false: the probe's query ids live in a deliberately
      // SEPARATE id space (vec_id + 1e6), so the measured plan must be the
      // documented separate-id-space deployment path — no self-id filter.
      val rc = Ann.ivfModelFrom(spark.read.parquet(s"$dir/coarse"))
      val rp = Ann.pqModelFrom(spark.read.parquet(s"$dir/pq"))
      val index = spark.read.parquet(s"$dir/index")
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = Ann.ivfPqSearch(rc, rp, index, queries, k = 5,
          excludeSelf = false).count()
        println(f"SEARCH run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

      // decontamination deployment path: eval batch probes a reloaded
      // IVF model + raw-vector index (SemDedup.dupsAgainstIndex with
      // excludeSelf=false — the independent-id-space decontaminate
      // contract). The warm number is what a new benchmark costs
      // against an already-maintained training index.
      val ivfCents = Ann.ivfFit(embs, c = 16, trainMod = 4)
      Ann.ivfModelDf(spark, ivfCents).write.parquet(s"$dir/ivf")
      Ann.ivfEncode(embs, ivfCents).write.parquet(s"$dir/ivfindex")
      val rIvf = Ann.ivfModelFrom(spark.read.parquet(s"$dir/ivf"))
      val rIdx = spark.read.parquet(s"$dir/ivfindex")
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.SemDedup.dupsAgainstIndex(queries, rIvf,
          rIdx, threshold = 0.9, excludeSelf = false).count()
        println(f"DECONTAM run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    } finally {
      spark.stop()
      // a probe must not leave artifacts behind
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
