package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.operators.Winnow

/** Diagnostic: where does a COLD spanExtents spend its ~20 s on the
  * real corpus? Times each stage with a cold cache.
  */
object WinnowTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[winnow-time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val docs = Tables.documents(spark, d)
    docs.count()
    val fp = t("fingerprints count") {
      val f = Winnow.fingerprints(docs, 5, 8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[winnow-time] fp rows = ${f.count()}")
      f
    }
    val hot = t("df aggregation") {
      fp.groupBy(col("fh")).agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") > 50).select(col("fh")).count()
    }
    println(s"[winnow-time] hot fhs = $hot")
    t("self-join + dedup count") {
      val ok = fp.join(broadcast(
        fp.groupBy(col("fh")).agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") > 50).select(col("fh"))), Seq("fh"), "left_anti")
      val n = ok.as("a").join(ok.as("b"),
          col("a.fh") === col("b.fh") && col("a.gram") === col("b.gram")
            && col("a.doc_id") < col("b.doc_id"))
        .count()
      println(s"[winnow-time] shared rows = $n")
    }
    spark.stop()
  }
}
