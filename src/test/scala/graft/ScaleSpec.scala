package graft

import org.apache.spark.sql.functions._

/** Scale-up smoke: the same plans over 32× the rows (≈2M lineitem)
  * must still complete with the partitioning/broadcast posture intact,
  * and exact-decimal aggregates must scale EXACTLY linearly — the
  * correctness invariant that survives any re-partitioning.
  */
class ScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("decimal aggregate over 32x replicated lineitem is exactly 32x the base") {
    val li = Tables.lineitem(spark, dir)
    val big = (1 to 32).map(_ => li).reduce(_ unionAll _).repartition(32)
    val base = li.agg(sum(Q.dec(col("l_extendedprice")))).head.getDecimal(0)
    val scaled = big.agg(sum(Q.dec(col("l_extendedprice")))).head.getDecimal(0)
    assert(scaled.compareTo(base.multiply(new java.math.BigDecimal(32))) == 0)
    assert(big.count() === li.count() * 32)
  }

  test("fact-dim join over replicated fact fans out exactly and stays broadcast") {
    val li = Tables.lineitem(spark, dir)
    val big = (1 to 8).map(_ => li).reduce(_ unionAll _)
    val joined = big.join(broadcast(Tables.orders(spark, dir)),
      col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() === li.count() * 8)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("exact dedup over a 32x replicated corpus: same groups, n_copies exactly 32x") {
    // the scale-invariance law of content dedup: replicating the corpus
    // changes copy COUNTS, never group structure or canonical choice
    val docs = Tables.documents(spark, dir)
    val base = operators.Dedup.exactGroups(docs)
      .select(col("content_hash"), col("canonical_id"), col("n_copies"))
    val big = (1 to 32).map(_ => docs).reduce(_ unionAll _).repartition(32)
    val scaled = operators.Dedup.exactGroups(big)
      .select(col("content_hash"), col("canonical_id"),
        (col("n_copies") / 32).cast("long").as("n_copies"))
    assert(base.count() === scaled.count())
    assert(base.exceptAll(scaled).count() === 0)
    assert(scaled.exceptAll(base).count() === 0)
  }

  test("domain quota over a 32x-grown corpus still keeps exactly k per domain") {
    // quota's law: output size is quota-bound, not corpus-bound — the
    // property that makes the two-phase prefilter shape safe at 100 TB.
    // Growth model: 32 replicas with DISTINCT remapped ids (quota's
    // contract assumes unique doc ids; duplicated ids would tie on the
    // hash rank). Every domain's pre-quota count scales exactly 32x,
    // and the kept set stays exactly k rows per domain.
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val nBase = docs.count()
    val big = (0 until 32).map(r =>
        docs.select((col("doc_id") * 32 + lit(r)).as("doc_id"), col("source")))
      .reduce(_ unionAll _).repartition(32)
    val kept = operators.Quota.perDomain(big, "source", "doc_id", k = 7)
    val perDomain = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), max(col("domain_n")).as("dn"),
        min(col("domain_n")).as("dn2"))
    // every domain large at 32x → exactly k kept, never more or fewer
    assert(perDomain.filter(col("n_kept") =!= 7).count() === 0)
    // pre-quota counts are exact and 32x the base domain sizes
    val baseCounts = docs.groupBy(col("source")).agg(count(lit(1)).as("base_n"))
    assert(perDomain.join(baseCounts, "source")
      .filter(col("dn") =!= col("base_n") * 32 || col("dn2") =!= col("dn"))
      .count() === 0)
    assert(big.count() === nBase * 32)
  }
}
