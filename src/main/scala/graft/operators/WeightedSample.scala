package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement (Efraimidis & Spirakis,
  * "Weighted random sampling with a reservoir", IPL 2006): keep the k
  * items with the largest priority key u^(1/w), where u is a uniform
  * draw and w the item's weight — inclusion probability ∝ w, exactly
  * the A-ES reservoir semantics but expressed as a deterministic
  * corpus-wide top-k (u comes from a salted md5 of the id, the q145
  * rank discipline, so the "draw" is content-independent and
  * replayable).
  *
  * Scale shape: the key is a per-row projection; the top-k runs as
  * Spark's TakeOrderedAndProject — per-partition top-k then a k-sized
  * merge on the driver side of the final stage, never a global sort of
  * the corpus. k rows is the only thing that leaves the executors.
  *
  * Determinism across engines: the key is rounded to 9 decimal places
  * and ranked with a doc_id tie-break, so a libm ULP difference between
  * JVM pow and DuckDB pow can only matter if the true key sits within
  * 5e-10 of a rounding boundary AND the k-th rank lands between the two
  * rounded values — the q61/q71 rounding posture.
  *
  * Weight here: token count capped at `maxWeight` (token-budget-
  * proportional sampling); callers with a model-scored quality column
  * pass any positive weight expression instead via [[topKWeighted]].
  */
object WeightedSample {

  private val TwoPow60 = "1152921504606846976.0"

  /** (doc_id, n_words, w, skey) for the k selected docs. */
  def topK(docs: DataFrame, k: Int, maxWeight: Long = 500L): DataFrame =
    topKWeighted(
      docs.select(col("doc_id"),
        size(graft.functions.Text.words(col("text"))).cast("long").as("n_words")),
      least(col("n_words"), lit(maxWeight)), k)

  /** Generic form: any positive integral weight column expression over
    * any ids frame — `idCol` names the id column used for both the rank
    * hash and the tie-break (doc_id for the corpus tables).
    */
  def topKWeighted(ids: DataFrame, weight: org.apache.spark.sql.Column, k: Int,
                   idCol: String = "doc_id"): DataFrame =
    ids
      .withColumn("w", weight)
      .withColumn("rnk", expr(
        s"cast(conv(substring(md5(concat('wsample|', cast($idCol as string))), 1, 15), 16, 10) as bigint)"))
      .withColumn("skey", round(
        pow(expr(s"(cast(rnk as double) + 1.0d) / $TwoPow60"),
          expr("cast(1.0 as double) / cast(w as double)")), 9))
      .drop("rnk")
      .orderBy(col("skey").desc, col(idCol))
      .limit(k)
}
