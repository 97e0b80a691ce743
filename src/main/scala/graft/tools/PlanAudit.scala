package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

import graft._

/** Plan-quality sweep: print each query's join strategies and scan
  * shapes so accidental nested-loop joins / missed broadcasts / lost
  * pushdowns show up as a one-line diff.
  *
  * Global (un-partitioned) windows are detected STRUCTURALLY — a
  * catalyst Window node with an empty partitionSpec — not by regex over
  * the plan string: the r5 audit's string match required a single
  * non-space token before ASC/DESC and missed the `Window.partitionBy()`
  * spelling entirely (q155), which is exactly the kind of dodge an audit
  * tool must not allow. Every detected global window must be registered
  * in [[boundedWhitelist]] with a bounded-by-construction justification,
  * or the audit exits non-zero.
  */
object PlanAudit {

  /** Count of un-partitioned Window operators in the optimized plan.
    * Catches every spelling — Window.orderBy(...), Window.partitionBy()
    * (empty varargs), multi-token ordering expressions — because it
    * inspects the node's partitionSpec, not the plan text.
    */
  def globalWindows(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.size

  /** Queries allowed to carry a global window, each with the proof that
    * its window input is bounded by construction (rows at the window are
    * O(1)/O(partitions), never corpus-sized — SURVEY §6's ban is on
    * data-sized windows).
    */
  val boundedWhitelist: Map[String, String] = Map(
    "q140_bm25" -> "rank window runs AFTER limit-first top-k: input <= 10 rows",
    "q155_dedup_threshold_calibration" ->
      "max(f1) over () on the threshold sweep: input = 13 sweep rows",
    "q163_sequence_packing" ->
      "global window on per-partition pack summaries: input <= #partitions rows")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val interesting = Seq(
      "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct")
    var violations = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        val plan = df.queryExecution.executedPlan.toString
        val joins = interesting.flatMap { j =>
          val n = j.r.findAllIn(plan).length
          if (n > 0) Some(s"$j x$n") else None
        }
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
        val globalWin = globalWindows(df)
        val winFlag =
          if (globalWin == 0) ""
          else boundedWhitelist.get(name) match {
            case Some(reason) => s" globalWindow=$globalWin (bounded: $reason)"
            case None =>
              violations ::= name
              s" globalWindow=$globalWin UNBOUNDED-NOT-WHITELISTED"
          }
        println(f"[plan] $name%-28s ${joins.mkString(", ")}%-60s shuffles=$exchanges$winFlag")
      } catch {
        case e: Throwable => println(s"[plan] $name ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
    if (violations.nonEmpty) {
      System.err.println(
        s"[plan] FAIL: un-whitelisted global windows in: ${violations.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
