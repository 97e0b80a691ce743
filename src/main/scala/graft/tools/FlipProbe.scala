package graft.tools
import graft._

/** Join-shape parity probe across scale factors: runs each named query
  * at two SFs and reports its BroadcastHashJoin / SortMergeJoin counts
  * after AQE finalizes. The evidence line behind every cross-scale
  * shuffle-ratio adjudication (tools/xscale_gate.py): a >12x
  * bytes-per-decade key whose join counts are IDENTICAL at both scales
  * did not lose a broadcast — the growth is the partial-aggregation
  * keys-bound -> rows-bound transition (or genuine row growth), not a
  * plan flip.
  *
  * Usage: tools/run.sh graft.tools.FlipProbe [query ...]
  * (no args = the r14-adjudicated five; dirs default to sf0.1 + sf1,
  * override with FLIP_DIRS=dir1,dir2).
  */
object FlipProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = if (args.nonEmpty) args.toSeq
      else Seq("q18_in_subquery", "q19_correlated_subquery", "q20_cte",
        "q25_having", "q75_tpch_q10")
    val dirs = sys.env.get("FLIP_DIRS").map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.1", "target/testdata/sf1"))
    for (d <- dirs;
         q <- queries) {
      val df = SparkEntry.queries(q)(spark, d)
      df.count() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      println(s"[flip] $d $q bhj=$bhj smj=$smj")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
