package graft

import org.apache.spark.sql.functions._

/** q143's bit-pattern formulas vs the JVM's own implementations.
  *
  * The query's oracle proves Spark == DuckDB on the shared arithmetic;
  * this spec proves the shared arithmetic == the REAL functions
  * (java.util.zip.CRC32, Double.doubleToLongBits, Float.floatToIntBits),
  * so the q143 surface genuinely implements binary.rst:72-120 semantics.
  */
class BinaryFuncsSpec extends SparkSpec {
  import graft.queries.FunctionQueries.{crcSpark, ieeeBits}

  test("crc32 nibble fold matches Spark's builtin crc32 (zlib CRC-32)") {
    import spark.implicits._
    val docs = Seq("doc-0", "doc-123", "hello world", "a",
      "The quick brown fox jumps over the lazy dog", "0123456789" * 20)
      .toDF("t")
    val rows = docs
      .select(expr(crcSpark("t")).as("fold"), crc32(col("t").cast("binary")).as("builtin"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("crc32 fold matches zlib CRC-32 on 200 random printable-ASCII strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val docs = (1 to 200).map { _ =>
      val len = 1 + rnd.nextInt(80)
      (1 to len).map(_ => (32 + rnd.nextInt(95)).toChar)
        .mkString.replace("'", "x") // SQL literal safety irrelevant (column), keep anyway
    }.toDF("t")
    val rows = docs
      .select(col("t"), expr(crcSpark("t")).as("fold")).collect()
    rows.foreach { r =>
      val crc = new java.util.zip.CRC32()
      crc.update(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) == crc.getValue, s"mismatch on '${r.getString(0)}'")
    }
  }

  test("ieee754 bit formulas match doubleToLongBits / floatToIntBits") {
    import spark.implicits._
    val xs = Seq(2.25, 3.0, 1.0, 256.25, 501.25, 1048578.25, 7.75)
    val rows = xs.toDF("x")
      .select(col("x"),
        expr(ieeeBits("x", 1023L, 4503599627370496L)).as("b64"),
        expr(ieeeBits("x", 127L, 8388608L)).as("b32"))
      .collect()
    rows.foreach { r =>
      val x = r.getDouble(0)
      assert(r.getLong(1) == java.lang.Double.doubleToLongBits(x))
      assert(r.getLong(2) == java.lang.Float.floatToIntBits(x.toFloat).toLong)
    }
  }
}
