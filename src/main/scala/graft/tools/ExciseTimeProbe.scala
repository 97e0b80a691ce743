package graft.tools

import graft._
import graft.operators.Winnow

/** Diagnostic: stage timing of q191's exciseSpans on the real corpus. */
object ExciseTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[excise-time] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val docs = Tables.documents(spark, d)
    val ext = t("spanExtents") { Winnow.spanExtents(docs, 5, 8, 50) }
    println(s"[excise-time] extent rows = ${ext.count()}")
    spark.catalog.clearCache()
    val out = t("exciseSpans construct") { Winnow.exciseSpans(docs, 5, 8, 50) }
    t("exciseSpans execute") { out.count() }
    t("exciseSpans run b") { Winnow.exciseSpans(docs, 5, 8, 50).count() }
    spark.stop()
  }
}
