package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with scale-tuned defaults.
  *
  * The same settings we would ship on a 1000-executor cluster, scaled to
  * local[N]: AQE on (runtime partition coalescing + skew-join splitting),
  * shuffle partitions sized to the local core count, autoBroadcast for the
  * dimension tables. See SURVEY.md §6.
  */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors.min(32))
      : SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type —
      // read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // saveAsTable target (bucketed-table demos, specs) — keep the
      // warehouse out of the repo checkout
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
