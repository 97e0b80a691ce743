package graft

import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._

/** q166's parse family, fuzzed beyond the oracle's data range:
  * randomized instants (1900–2100) and offsets (full ±14:00 in 15-min
  * steps, wider than the query's ±7 h) parsed by Spark's
  * unix_timestamp(XXX pattern) must agree with java.time's
  * ISO_OFFSET_DATE_TIME to the second, and the derived
  * timezone_hour/minute must recover the generated offset with signs
  * intact.
  */
class DatetimeParseSpec extends SparkSpec {

  test("randomized ISO-8601 offset parse parity with java.time") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val cases = (1 to 500).map { _ =>
      // epoch seconds in [1900-01-01, 2100-01-01)
      val epoch = -2208988800L + (rnd.nextDouble() * 6311433600L).toLong
      val offMin = (rnd.nextInt(113) - 56) * 15 // ±14:00 in 15-min steps
      val odt = OffsetDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(epoch),
        java.time.ZoneOffset.ofTotalSeconds(offMin * 60))
      (odt.format(DateTimeFormatter.ISO_OFFSET_DATE_TIME), epoch, offMin.toLong)
    }
    val rows = cases.toDF("iso", "expected_epoch", "off_min")
      .withColumn("parsed", unix_timestamp(col("iso"), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .withColumn("local_epoch",
        unix_timestamp(substring(col("iso"), 1, 19), "yyyy-MM-dd'T'HH:mm:ss"))
      .withColumn("recovered_off_min", (col("local_epoch") - col("parsed")) / 60)
      .filter(col("parsed") =!= col("expected_epoch") ||
        col("recovered_off_min") =!= col("off_min"))
    assert(rows.count() == 0, rows.take(3).mkString("; "))
  }

  test("signed hour/minute decomposition matches the generated offset") {
    import spark.implicits._
    // the q166 sign discipline: abs-first, sign applied to both fields
    val offs = ((-56) to 56).map(i => (i * 15).toLong)
    val rows = offs.toDF("off_min")
      .withColumn("off_secs", col("off_min") * 60)
      .withColumn("sig", when(col("off_secs") < 0, -1L).otherwise(1L))
      .withColumn("a", abs(col("off_secs")))
      .withColumn("tz_hour", col("sig") * ((col("a") - col("a") % 3600) / 3600).cast("long"))
      .withColumn("tz_minute", col("sig") * (((col("a") % 3600) - (col("a") % 60)) / 60).cast("long"))
      .filter(col("tz_hour") * 60 + col("tz_minute") =!= col("off_min"))
    assert(rows.count() == 0)
  }
}
