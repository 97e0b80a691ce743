package graft.tools

import graft._

/** Diagnostic: print the formatted physical plan of one registered
  * query (PlanAudit gives counts; this gives the full tree when a
  * count needs explaining). Usage: tools/run.sh graft.tools.ExplainProbe <query> [sfDir]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: tools/run.sh graft.tools.ExplainProbe <query-name> [sfDir]")
      sys.exit(2)
    }
    val name = args(0)
    val spark = GraftSession.get()
    val fn = SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name'; registered names:\n  " +
        SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    })
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    fn(spark, d).explain("formatted")
    spark.stop()
  }
}
