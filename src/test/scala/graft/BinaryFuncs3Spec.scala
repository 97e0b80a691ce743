package graft

import org.apache.spark.sql.functions._

/** q156's codec formulas vs the JVM's own implementations.
  *
  * The query's oracle proves Spark == DuckDB on the replayed folds (and
  * pins sha1/sha512 to the published FIPS-180 vectors); this spec proves
  * the folds == the REAL codecs — java.security.MessageDigest for
  * sha1/sha512 on arbitrary strings, a from-the-RFC base32 reference
  * encoder (RFC 4648 §6 incl. the §10 test vectors), and
  * java.util.Base64.getUrlEncoder for the URL-safe alphabet.
  */
class BinaryFuncs3Spec extends SparkSpec {
  import graft.queries.FunctionQueries.{b32EncSpark, b32DecSpark}

  /** Independent reference base32 (RFC 4648 §6), bit-shift free of the
    * SQL fold's structure: accumulate bits MSB-first, emit 5 at a time. */
  private def refBase32(s: String): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val bytes = s.getBytes("US-ASCII")
    val sb = new StringBuilder
    var acc = 0L
    var nbits = 0
    for (b <- bytes) {
      acc = (acc << 8) | (b & 0xffL); nbits += 8
      while (nbits >= 5) { sb += alpha(((acc >> (nbits - 5)) & 31).toInt); nbits -= 5 }
    }
    if (nbits > 0) sb += alpha(((acc << (5 - nbits)) & 31).toInt)
    while (sb.length % 8 != 0) sb += '='
    sb.toString
  }

  private def b32Frame(ts: Seq[String]) = {
    import spark.implicits._
    ts.toDF("t2")
      .withColumn("bs", expr("transform(sequence(1, length(t2)), i -> cast(ascii(substr(t2, i, 1)) as bigint))"))
      .withColumn("nc", expr("(8 * length(t2) + 4) div 5"))
      .withColumn("b32", expr(b32EncSpark("bs", "nc")))
  }

  test("base32 fold matches RFC 4648 §10 test vectors") {
    val vecs = Map("" -> "", "f" -> "MY======", "fo" -> "MZXQ====",
      "foo" -> "MZXW6===", "foob" -> "MZXW6YQ=", "fooba" -> "MZXW6YTB",
      "foobar" -> "MZXW6YTBOI======")
    val rows = b32Frame(vecs.keys.toSeq.filter(_.nonEmpty)) // length(t2)=0 row is trivial
      .select(col("t2"), col("b32")).collect()
    rows.foreach(r => assert(r.getString(1) == vecs(r.getString(0)),
      s"'${r.getString(0)}' -> ${r.getString(1)}"))
  }

  test("base32 encode+decode round-trips 200 random ASCII strings vs the reference encoder") {
    val rnd = new scala.util.Random(20260813L)
    val ts = (1 to 200).map { _ =>
      val len = 1 + rnd.nextInt(40)
      (1 to len).map(_ => (33 + rnd.nextInt(94)).toChar).mkString.replace("'", "x")
    }
    val rows = b32Frame(ts)
      .withColumn("rt", expr(b32DecSpark("b32", "nc", "length(t2)")))
      .select(col("t2"), col("b32"), col("rt")).collect()
    rows.foreach { r =>
      assert(r.getString(1) == refBase32(r.getString(0)), s"encode '${r.getString(0)}'")
      assert(r.getString(2) == r.getString(0), s"decode '${r.getString(0)}'")
    }
  }

  test("native base32 expressions match the SQL fold on ASCII and round-trip raw binary") {
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    val ts = (1 to 100).map { _ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => (33 + rnd.nextInt(94)).toChar).mkString.replace("'", "x")
    }
    val parity = b32Frame(ts)
      .withColumn("native", expr("graft_to_base32(cast(t2 as binary))"))
      .select(col("b32"), col("native")).collect()
    parity.foreach(r => assert(r.getString(0) == r.getString(1)))

    // the native codec's domain is FULL binary (the fold is ASCII-only)
    val bins = (1 to 60).map(_ => (0 to rnd.nextInt(40)).map(_ => rnd.nextInt(256).toByte).toArray)
    val rt = bins.map(Tuple1(_)).toDF("b")
      .select(col("b"), expr("graft_from_base32(graft_to_base32(b))").as("rt")).collect()
    rt.foreach(r => assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1))))
  }

  test("sha1/sha512 match MessageDigest on 100 random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val ts = (1 to 100).map { _ =>
      (1 to rnd.nextInt(120)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val rows = ts.toDF("t")
      .select(col("t"), sha1(col("t").cast("binary")).as("s1"),
        sha2(col("t").cast("binary"), 512).as("s512")).collect()
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    rows.foreach { r =>
      val bytes = r.getString(0).getBytes("UTF-8")
      assert(r.getString(1) == hex(java.security.MessageDigest.getInstance("SHA-1").digest(bytes)))
      assert(r.getString(2) == hex(java.security.MessageDigest.getInstance("SHA-512").digest(bytes)))
    }
  }

  test("base64url translate matches java.util.Base64.getUrlEncoder") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val ts = (1 to 100).map { _ =>
      (0 to rnd.nextInt(60)).map(_ => rnd.nextInt(256).toByte).toArray
    }
    val rows = ts.map(b => Tuple1(b)).toDF("b")
      // strip Spark's MIME chunking (line breaks every 76 chars) — the
      // q156 production expression does the same
      .select(col("b"),
        translate(regexp_replace(base64(col("b")), "[\\r\\n]", ""), "+/", "-_").as("u"))
      .collect()
    rows.foreach { r =>
      val b = r.getAs[Array[Byte]](0)
      assert(r.getString(1) == java.util.Base64.getEncoder.encodeToString(b)
        .replace('+', '-').replace('/', '_'))
      // identical to the URL encoder's output (same alphabet, padding kept)
      assert(r.getString(1) == java.util.Base64.getUrlEncoder.encodeToString(b))
    }
  }
}
