package graft.tools

import graft._

/** Plan-quality sweep: print each query's join strategies and scan
  * shapes so accidental nested-loop joins / missed broadcasts / lost
  * pushdowns show up as a one-line diff.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val interesting = Seq(
      "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val joins = interesting.flatMap { j =>
          val n = j.r.findAllIn(plan).length
          if (n > 0) Some(s"$j x$n") else None
        }
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
        // un-partitioned window = windowspecdefinition whose FIRST element
        // is already an ordering (no partition columns) — the
        // corpus-serializing idiom §6 bans on data-sized inputs (final
        // single-row global aggregates also use a SinglePartition exchange
        // but are partial-agg reductions, not flagged). Every flagged
        // occurrence must be accounted for in SURVEY as bounded-input.
        val globalWin =
          "windowspecdefinition\\(\\s*\\S+ (?:ASC|DESC)".r.findAllIn(plan).length
        val winFlag = if (globalWin > 0) s" globalWindow=$globalWin" else ""
        println(f"[plan] $name%-28s ${joins.mkString(", ")}%-60s shuffles=$exchanges$winFlag")
      } catch {
        case e: Throwable => println(s"[plan] $name ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
