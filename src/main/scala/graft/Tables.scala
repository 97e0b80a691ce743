package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated test schema (TESTDATA.md).
  *
  * Mirrors the reference's TPC-H connector surface
  * (reference: presto-tpch/src/main/java/com/facebook/presto/tpch/TpchMetadata.java:1)
  * re-expressed as plain parquet scans so Catalyst gets pushdown + pruning.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet — Spark reads it as long
    * nanos (spark.sql.legacy.parquet.nanosAsLong); convert to a real
    * timestamp (micros) here so downstream code sees TimestampType.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      // integer DIV, not `/`: nanos epochs (~1.7e18) exceed double's 2^53
      // mantissa, so float division would corrupt low-order micros
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000L")))
  }
  /** The corpus tables feed CPU-heavy per-row pipelines (shingling,
    * sketch hashing, vector kernels). A small parquet file is a single
    * row group — one task would do all that work while the rest of the
    * cluster idles — so rebalance up to the session's shuffle
    * parallelism when the scan has fewer partitions. At warehouse scale
    * the scan already has ≥ that many partitions and this is a no-op;
    * the round-robin shuffle moves only the raw corpus rows, far
    * smaller than the downstream shingle/candidate explosion.
    */
  private def rebalanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    rebalanced(load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    rebalanced(load(s, d, "embeddings"))
}
