package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classification-evaluation aggregates (reference aggregate.rst:
  * classification_precision / _recall / _fall_out / _miss_rate /
  * _thresholds; impl presto-main/.../aggregation/
  * ClassificationPrecisionAggregation.java and siblings — all built on
  * a fixed-bucket histogram over [0, 1] predictions).
  *
  * Scale shape: one hash shuffle on (group, bucket) reduces the corpus
  * to ≤ groups×buckets rows; the threshold sweep is then a window over
  * those tiny per-group histograms, and the output arrays are assembled
  * from ≤ `buckets` rows per group. Never materializes per-row state —
  * the same two-phase posture the reference's histogram aggregates use.
  *
  * Pinned semantics (the reference's array lengths depend on observed
  * buckets): thresholds are t_j = j/buckets for j = 0..buckets−1, all
  * arrays have exactly `buckets` entries, an entry is NULL where the
  * metric is undefined (empty denominator). "Predicted positive at
  * t_j" means the prediction's bucket index ≥ j.
  */
object MlEval {

  /** Per-group threshold sweep: thresholds, precision, recall,
    * fall_out (FPR), miss_rate (FNR) as fixed-length arrays.
    * `y` boolean outcome, `x` prediction in [0, 1], optional weight.
    */
  def classificationEval(df: DataFrame, group: String, y: Column, x: Column,
                         buckets: Int, weight: Column = lit(1.0)): DataFrame = {
    val perBucket = df
      .select(col(group),
        least(floor(x * buckets), lit(buckets - 1)).cast("int").as("bk"),
        (when(y, 1.0).otherwise(0.0) * weight).as("pw"),
        weight.cast("double").as("tw"))
      .groupBy(col(group), col("bk"))
      .agg(sum(col("pw")).as("pw"), sum(col("tw")).as("tw"))

    // full bucket spine so arrays are fixed-length even for empty buckets
    val spine = perBucket.select(col(group)).distinct()
      .select(col(group), explode(expr(s"sequence(0, ${buckets - 1})")).as("bk"))
    val filled = spine.join(perBucket, Seq(group, "bk"), "left")
      .na.fill(0.0, Seq("pw", "tw"))

    val suffix = Window.partitionBy(col(group))
      .orderBy(col("bk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col(group))
    val swept = filled
      .withColumn("cpos", sum(col("pw")).over(suffix))  // predicted-pos ∧ y
      .withColumn("ctot", sum(col("tw")).over(suffix))  // predicted-pos
      .withColumn("tpos", sum(col("pw")).over(whole))
      .withColumn("tneg", sum(col("tw") - col("pw")).over(whole))
      .select(col(group), col("bk"),
        round(col("bk").cast("double") / buckets, 6).as("t"),
        when(col("ctot") > 0, round(col("cpos") / col("ctot"), 6)).as("prec"),
        when(col("tpos") > 0, round(col("cpos") / col("tpos"), 6)).as("rec"),
        when(col("tneg") > 0, round((col("ctot") - col("cpos")) / col("tneg"), 6)).as("fo"),
        when(col("tpos") > 0, round((col("tpos") - col("cpos")) / col("tpos"), 6)).as("mr"))

    swept.groupBy(col(group))
      .agg(
        expr("transform(array_sort(collect_list(struct(bk, t))), s -> s.t)").as("thresholds"),
        expr("transform(array_sort(collect_list(struct(bk, prec))), s -> s.prec)").as("precision_a"),
        expr("transform(array_sort(collect_list(struct(bk, rec))), s -> s.rec)").as("recall_a"),
        expr("transform(array_sort(collect_list(struct(bk, fo))), s -> s.fo)").as("fall_out_a"),
        expr("transform(array_sort(collect_list(struct(bk, mr))), s -> s.mr)").as("miss_rate_a"))
  }
}
