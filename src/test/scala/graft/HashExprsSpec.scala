package graft

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.functions._

import graft.plans.{HmacHash, Murmur3X64128, NativeFunctions}

/** graft_murmur3_x64_128 + graft_hmac_* vs independent checks:
  *
  *  - murmur3: the reference's own test vectors (reference
  *    presto-main/.../scalar/TestVarbinaryFunctions.java:348) plus
  *    byte-pattern pins at block/tail boundary lengths (8/15/16/31/32/33
  *    — every branch of the x64_128 block loop and both tail halves),
  *    cross-validated against an independently written implementation
  *    of the same published algorithm.
  *  - hmac: the RFC 2104 construction here vs javax.crypto.Mac (the
  *    JDK's own independent HMAC) on randomized data/key pairs,
  *    including keys straddling the block size; reference vectors are
  *    pinned in q170's oracle.
  */
class HashExprsSpec extends SparkSpec {

  private def hexOf(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

  test("murmur3_x64_128 matches the reference test vectors") {
    assert(hexOf(Murmur3X64128.compute(Array.emptyByteArray)) ==
      "00000000000000000000000000000000")
    assert(hexOf(Murmur3X64128.compute("hashme".getBytes("UTF-8"))) ==
      "93192FE805BE23041C8318F67EC4F2BC")
  }

  test("murmur3_x64_128 boundary-length pins (bytes 1..n)") {
    val pins = Map(
      8 -> "DCBF93EFA50CE89C07AC55B6E6E567C5",
      15 -> "95FC2048A0F04B08D038FACBE83577A5",
      16 -> "E00F74EF6047C9B23589B912855D2F89",
      31 -> "DB3D5197E3627DE6F66EEEF00A27462B",
      32 -> "8819EBA0AAE000DE7E195113C74DCEAC",
      33 -> "845C0D007A246B9EDEEC0945600D6E47")
    pins.foreach { case (n, want) =>
      val data = Array.tabulate[Byte](n)(i => (i + 1).toByte)
      assert(hexOf(Murmur3X64128.compute(data)) == want, s"len $n")
    }
  }

  test("murmur3_x64_128 through the DataFrame/codegen path") {
    import spark.implicits._
    val got = Seq("", "hashme").toDF("s")
      .select(col("s"), hex(NativeFunctions.murmur3x64128(col("s").cast("binary"))).as("h"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("") == "00000000000000000000000000000000")
    assert(got("hashme") == "93192FE805BE23041C8318F67EC4F2BC")
  }

  test("hmac matches javax.crypto.Mac on 200 randomized (data, key) pairs per algo") {
    val rnd = new scala.util.Random(20260813L)
    val algos = Seq(("MD5", "HmacMD5", 64), ("SHA-1", "HmacSHA1", 64),
      ("SHA-256", "HmacSHA256", 64), ("SHA-512", "HmacSHA512", 128))
    for ((algo, macName, block) <- algos) {
      (1 to 200).foreach { i =>
        val data = new Array[Byte](rnd.nextInt(200))
        rnd.nextBytes(data)
        // sweep key lengths across the block boundary so the
        // hash-the-key path (len > B) is exercised
        val key = new Array[Byte](1 + (if (i % 3 == 0) block + rnd.nextInt(64)
                                       else rnd.nextInt(block)))
        rnd.nextBytes(key)
        val mac = Mac.getInstance(macName)
        mac.init(new SecretKeySpec(key, macName))
        val want = mac.doFinal(data)
        val got = HmacHash.compute(data, key, algo, block)
        assert(java.util.Arrays.equals(got, want), s"$algo pair $i (keyLen ${key.length})")
      }
    }
  }

  test("hmac through the DataFrame/codegen path with a long key") {
    import spark.implicits._
    val r = Seq(("The quick brown fox jumps over the lazy dog", "key")).toDF("d", "k")
      .select(hex(NativeFunctions.hmac(col("d").cast("binary"),
        col("k").cast("binary"), "SHA-256")).as("h"))
      .collect().head.getString(0)
    // the widely published HMAC-SHA256 example value
    assert(r == "F7BC83F430538424B13298E6AA6FB143EF4D59A14946175997479DBC2D1A3CD8")
    val e = intercept[IllegalArgumentException] {
      NativeFunctions.hmac(lit("a").cast("binary"), lit("k").cast("binary"), "SHA-3")
    }
    assert(e.getMessage.contains("SHA-3"))
  }

  test("SQL surface: graft_murmur3_x64_128 and graft_hmac_sha256") {
    val r = spark.sql(
      "SELECT hex(graft_murmur3_x64_128(cast('hashme' AS BINARY))) AS m, " +
        "hex(graft_hmac_sha256(cast('' AS BINARY), cast('key' AS BINARY))) AS h")
      .collect().head
    assert(r.getString(0) == "93192FE805BE23041C8318F67EC4F2BC")
    assert(r.getString(1) == "5D5D139563C95B5967B9BD9A8C9B233A9DEDB45072794CD232DC1B74832607D0")
  }
}
