package graft.tools
import org.apache.spark.sql.functions._
import graft._
import graft.operators.Ann
object NswDiagProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "target/testdata/sf1"
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val twins = embs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val out = Ann.nswKnn(embs, twins, k = 5, trainMod = 4)
    val top1 = out.filter(col("rn") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val missed = top1.filter { case (q, c, s) => c != q - 1000000L }
    println(s"[diag] missed=${missed.mkString(";")}")
    // rebuild the same artifacts nswKnn used to inspect cell structure
    val cells = math.max(8, math.ceil(math.sqrt(embs.count().toDouble)).toInt)
    val cents = Ann.ivfFit(embs, cells, iters = 2, trainMod = 4)
    val index = Ann.ivfEncode(embs, cents).persist(); index.count()
    val sizes = index.groupBy(col("cluster")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    println(s"[diag] cellsize min=${sizes.values.min} max=${sizes.values.max} " +
      s"p50=${sizes.values.toSeq.sorted.apply(sizes.size/2)}")
    for ((q, _, _) <- missed) {
      val anchor = q - 1000000L
      val acell = index.filter(col("vec_id") === anchor).select("cluster").head().getInt(0)
      println(s"[diag] q=$q anchor=$anchor anchorCell=$acell size=${sizes(acell)}")
    }
    spark.stop()
  }
}
