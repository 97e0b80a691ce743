package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row
  * with the same key and the greatest right-time ≤ left-time. The
  * training-data use case: attach the latest snapshot/feature row known
  * at event time without leaking the future.
  *
  * Built by composition (the brief's preference order: compose before
  * custom plans): tag both inputs, union, and carry the last right row
  * forward inside one (key, time)-sorted window. Exactly one shuffle on
  * the key, no join fan-out at all — at 100 TB this beats a range join's
  * candidate explosion and needs no new physical operator. Right rows
  * sort before left rows at equal time, so "≤" is inclusive.
  *
  * Contract: the right side must be unique per (key, time) — dedupe
  * first (ties would be nondeterministic in any engine; DuckDB's ASOF
  * JOIN has the same caveat). Left rows with no prior right row keep
  * null right columns (left-outer semantics).
  */
object AsOf {

  def join(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val rStruct = struct(rightCols.map(right(_)): _*)
    val l = left.select(leftKey.as("__k"), leftTime.as("__t"),
      lit(1).as("__side"), lStruct.as("__l"),
      lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r"))
    val r = right.select(rightKey.as("__k"), rightTime.as("__t"),
      lit(0).as("__side"),
      lit(null).cast(left.select(lStruct).schema.head.dataType).as("__l"),
      rStruct.as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
