package graft.tools

import graft._

/** Diagnostic: print the formatted physical plan of one registered
  * query (PlanAudit gives counts; this gives the full tree when a
  * count needs explaining). Usage: tools/run.sh graft.tools.ExplainProbe <query> [sfDir]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val df = SparkEntry.queries(name)(spark, d)
    df.explain("formatted")
    spark.stop()
  }
}
