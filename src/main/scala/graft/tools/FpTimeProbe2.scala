package graft.tools

import org.apache.spark.sql.functions._

import graft._

object FpTimeProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[fp2] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val docs = Tables.documents(spark, d)
    println("[fp2] total words = " + docs.select(
      sum(size(graft.functions.Text.words(col("text"))))).collect()(0).get(0))
    val Shift = 1073741824L
    val w = 8
    val base = docs.select(col("doc_id"), graft.functions.Text.words(col("text")).as("w"))
    val sel = base
      .withColumn("hs", graft.plans.NativeFunctions
        .shingleHashes(col("w"), 5, "md5", graft.plans.Affine.P))
      .withColumn("comb", expr(s"transform(hs, (h, p) -> h * ${Shift}L + p)"))
      .withColumn("sel", expr(
        s"CASE WHEN size(comb) >= $w THEN array_distinct(transform(" +
          s"sequence(0, size(comb) - $w), i -> array_min(slice(comb, i + 1, $w)))) " +
          "ELSE array() END"))
    t("explode, NO gram") {
      sel.select(col("doc_id"), explode(col("sel")).as("c"))
        .select(col("doc_id"), expr(s"c % ${Shift}L").as("pos"),
          expr(s"c div ${Shift}L").as("fh")).count()
    }
    t("explode, WITH gram") {
      sel.select(col("doc_id"), col("w"), explode(col("sel")).as("c"))
        .select(col("doc_id"), expr(s"c % ${Shift}L").as("pos"),
          expr(s"c div ${Shift}L").as("fh"),
          expr(s"concat_ws(' ', slice(w, cast(c % ${Shift}L as int) + 1, 5))").as("gram"))
        .count()
    }
    spark.stop()
  }
}
