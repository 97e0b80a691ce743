package graft

import org.apache.spark.sql.functions._
import graft.operators.Quota

/** Per-domain quota sampling (q145 / graft.operators.Quota). */
class QuotaSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // one giant domain (5000 docs), one medium (100), several tiny (≤ k)
    val rows = (1L to 5000L).map(i => (i, "big")) ++
      (6000L to 6099L).map(i => (i, "mid")) ++
      (7000L to 7002L).map(i => (i, "tiny"))
    rows.toDF("doc_id", "domain")
  }

  test("keeps at most k docs per domain, all of small domains") {
    val out = Quota.perDomain(corpus, "domain", "doc_id", k = 10)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("big") == 10)
    assert(out("mid") == 10)
    assert(out("tiny") == 3) // domain smaller than the quota keeps all
  }

  test("deterministic under repartitioning (prefilter branch exercised)") {
    val a = Quota.perDomain(corpus.repartition(1), "domain", "doc_id", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Quota.perDomain(corpus.repartition(32), "domain", "doc_id", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    assert(a.size == 23)
  }

  test("prefilter keeps the window input ~margin*k per domain, not corpus-sized") {
    // with margin=8, k=10 the big domain (5000 docs) should admit far
    // fewer rows to the rank shuffle than it contains — expected 80,
    // binomial tail makes >300 astronomically unlikely
    val counts = corpus.join(
        broadcast(corpus.groupBy("domain").agg(count(lit(1)).as("domain_n"))), "domain")
      .where(col("domain_n") <= 80 ||
        expr("cast(conv(substring(md5(concat('quota|', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
          < expr("1152921504606846976L div domain_n") * 80)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") < 300, s"prefilter admitted ${counts("big")} rows")
    assert(counts("big") >= 10) // and enough to fill the quota
  }
}
