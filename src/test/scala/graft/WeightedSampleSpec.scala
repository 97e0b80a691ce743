package graft

import org.apache.spark.sql.functions._

import graft.operators.WeightedSample

/** Laws of Efraimidis–Spirakis weighted top-k sampling
  * (operators/WeightedSample.scala):
  *  - selection is deterministic and partition-invariant;
  *  - inclusion probability is monotone in weight (heavy items
  *    oversampled relative to their count share);
  *  - the selection equals a serial re-computation of the same keys.
  */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("selection matches a serial recomputation and is partition-invariant") {
    val ids = (1L to 4000L).map(i => (i, 1L + (i % 97))).toDF("doc_id", "w0")
    def run(parts: Int) = WeightedSample
      .topKWeighted(ids.repartition(parts), col("w0"), k = 300)
      .select("doc_id").as[Long].collect().toSet
    // serial oracle: same md5-60 u, same pow, same rounding, same tie-break
    val serial = (1L to 4000L).map { i =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsample|$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val rnk = java.lang.Long.parseLong(md5.take(15), 16)
      val u = (rnk.toDouble + 1.0) / 1152921504606846976.0
      val w = 1L + (i % 97)
      val key = BigDecimal(math.pow(u, 1.0 / w))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, key)
    }.sortBy { case (id, key) => (-key, id) }.take(300).map(_._1).toSet
    assert(run(3) == serial, "selection diverges from the serial E-S computation")
    assert(run(17) == serial, "selection is partition-dependent")
  }

  test("inclusion probability is monotone in weight") {
    // 2000 light docs (w=5) + 2000 heavy docs (w=400); k=800.
    // E-S inclusion ∝ w: heavy docs should dominate the sample.
    val ids = ((1L to 2000L).map((_, 5L)) ++ (2001L to 4000L).map((_, 400L)))
      .toDF("doc_id", "w0")
    val picked = WeightedSample.topKWeighted(ids, col("w0"), k = 800)
      .select("doc_id").as[Long].collect()
    val heavy = picked.count(_ > 2000L)
    assert(picked.length == 800)
    assert(heavy > 700, s"heavy class under-sampled: $heavy/800")
  }

  test("idCol parameter selects the same rows as the doc_id default") {
    // a caller whose id column isn't doc_id (the ADVICE r5 fix) must
    // get the identical selection — same rank hash, same tie-break
    val ids = (1L to 500L).map(i => (i, i % 97 + 1)).toDF("doc_id", "w0")
    val renamed = ids.withColumnRenamed("doc_id", "item_id")
    val a = WeightedSample.topKWeighted(ids, col("w0"), k = 50)
      .select("doc_id").as[Long].collect().toSet
    val b = WeightedSample.topKWeighted(renamed, col("w0"), k = 50, idCol = "item_id")
      .select("item_id").as[Long].collect().toSet
    assert(a == b)
  }
}
