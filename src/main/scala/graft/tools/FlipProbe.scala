package graft.tools
import graft._
object FlipProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.1", "target/testdata/sf1");
         q <- Seq("q18_in_subquery", "q19_correlated_subquery", "q20_cte",
           "q25_having", "q75_tpch_q10")) {
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
