package graft.tools
import org.apache.spark.sql.functions.col
import graft._
import graft.operators.Ann
/** NSW recall probe: twin top-1 recall + natural recall@5 vs brute. */
object NswProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val twins = embs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val t0 = System.nanoTime
    val got = Ann.nswKnn(embs, twins, k = 5, rounds = 2, trainMod = 4)
    val top1 = got.filter(col("rn") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val twinHits = top1.count { case (qid, cid, sim) => cid == qid - 1000000L && sim == 1.0 }
    println(s"[nsw] twin_top1=$twinHits/10 wall=${(System.nanoTime - t0) / 1e9}")
    if (sys.env.get("NSW_RECALL").isEmpty) { spark.stop(); return }
    // natural recall@5 vs brute on 20 natural queries
    val nat = embs.filter(col("vec_id") < 20)
    val nsw = Ann.nswKnn(embs, nat, k = 5, trainMod = 4)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Ann.bruteKnn(embs, nat, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[nsw] recall5=${(nsw & brute).size}/${brute.size}")
    spark.stop()
  }
}
