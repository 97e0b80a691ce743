package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom
import graft.plans.GraftBloom

/** Bloom-filter build/probe + the pruned semi join (q146). */
class BloomSpec extends SparkSpec {

  test("local kernel: no false negatives, FPP within bound") {
    val words = new Array[Long](1 << 14) // 2^20 bits
    val members = (0L until 10000L).map(_ * 7919 + 13)
    members.foreach(GraftBloom.add(words, 1 << 20, 5, _))
    val bytes = GraftBloom.serialize(words)
    members.foreach(v => assert(GraftBloom.mightContain(bytes, 5, v)))
    // theoretical FPP at m=2^20, n=10k, k=5 is ~2e-5; allow 100x slack
    val fp = (1L to 100000L).map(_ * 104729 + 7)
      .filterNot(members.contains)
      .count(GraftBloom.mightContain(bytes, 5, _))
    assert(fp < 200, s"false positives: $fp / 100000")
  }

  test("randomized: no false negatives across 50 random member sets + serde round-trip") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val nbits = 64 << rnd.nextInt(8) // 64 .. 8192 bits
      val words = new Array[Long](nbits / 64)
      val members = Seq.fill(1 + rnd.nextInt(200))(rnd.nextLong())
      members.foreach(GraftBloom.add(words, nbits, 5, _))
      val bytes = GraftBloom.serialize(words)
      assert(java.util.Arrays.equals(GraftBloom.serialize(GraftBloom.deserialize(bytes)), bytes))
      members.foreach(v =>
        assert(GraftBloom.mightContain(bytes, 5, v), s"false negative nbits=$nbits v=$v"))
    }
  }

  test("distributed build is partition-invariant (bitwise-OR merge)") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("k")
    val a = df.repartition(1).agg(Bloom.bloomAgg(col("k"))).collect()(0).getAs[Array[Byte]](0)
    val b = df.repartition(32).agg(Bloom.bloomAgg(col("k"))).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("prunedSemiJoin == plain semi join, and the bloom prunes before it") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"))
    val viaBloom = Bloom.prunedSemiJoin(fact, dim, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val plain = fact.join(dim, fact("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaBloom == plain)
    assert(plain.nonEmpty)

    // the probe sits in the plan (map-side filter on the fact scan)
    val plan = Bloom.prunedSemiJoin(fact, dim, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan)

    // and it actually prunes: surviving fact rows << total fact rows
    val bf = dim.agg(Bloom.bloomAgg(col("o_orderkey")).as("bf"))
    val pass = fact.crossJoin(broadcast(bf))
      .where(Bloom.mightContain(col("bf"), col("l_orderkey"))).count()
    val total = fact.count()
    assert(pass < total / 2, s"bloom passed $pass of $total")
  }
}
