package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (§2.4) — the Spark analog of the reference's JDBC
  * connector surface (reference: presto-base-jdbc module). Plain
  * `format("jdbc")` wiring: predicate pushdown and column pruning reach
  * the remote database via Spark's JDBC dialects; `partitionColumn`
  * splits the read into parallel range scans for large tables.
  */
object Jdbc {

  def write(df: DataFrame, url: String, table: String,
            driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): Unit =
    df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .save()

  def read(spark: SparkSession, url: String, table: String,
           driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .load()

  /** Parallel range-partitioned read: `numPartitions` concurrent range
    * scans over `[lower, upper]` of a numeric `partitionColumn` — the
    * scale path for bulk JDBC ingest.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString).option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
