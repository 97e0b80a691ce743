package graft

/** Benchmark main. Runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A failed query is recorded as "err" (not a fake timing) and excluded
  * from the total. Session comes from [[GraftSession]] so the bench path
  * exercises the same AQE/broadcast posture as production.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM + parquet footers once so per-query times measure the
    // query, not first-touch classloading.
    Tables.lineitem(spark, sfDir).count()
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          name -> Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            name -> Left("err")
        }
      }
    // Keep the JSON line compact (qNN keys, 3-decimal seconds): the driver
    // captures only the tail of stdout, and a full-names line risks
    // overflowing it (the r2 line was cut mid-stream and parsed as null).
    def fmt(v: Double): String = f"$v%.3f"
    def key(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map {
      case (k, Right(v)) => s""""${key(k)}":${fmt(v)}"""
      case (k, Left(_))  => s""""${key(k)}":"err""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: the driver captures only the stdout tail, which
    // truncated the r2 line mid-stream — keep a file copy too
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_last.json")),
      line.getBytes)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
