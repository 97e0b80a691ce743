package graft.tools
import org.apache.spark.sql.functions.col
import graft._
import graft.operators.Ann
/** The NSW recall-vs-nprobe dial, measured: natural recall@5 vs brute
  * for nprobe in {4, 8, 16, 32} at a fixed built graph.
  */
object NswRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val nat = embs.filter(col("vec_id") < 20)
    val cells = math.max(8, math.ceil(math.sqrt(embs.count().toDouble)).toInt)
    val cents = Ann.ivfFit(embs, cells, iters = 2, trainMod = 4)
    val index = Ann.ivfEncode(embs, cents).persist()
    index.count()
    val edges = Ann.nswBuild(index, 12, 3).persist(); edges.count()
    val entries = Ann.nswEntriesSampled(index).persist(); entries.count()
    val brute = Ann.bruteKnn(embs, nat, k = 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (np <- Seq(4, 16)) {
      val ivf = Ann.ivfSearch(cents, index, nat, k = 5, nprobe = np)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[nswrecall] ivfSearch nprobe=$np recall5=${(ivf & brute).size}/${brute.size}")
    }
    for (np <- Seq(4, 8, 16, 32)) {
      val t0 = System.nanoTime
      val got = Ann.nswSearch(cents, edges, index, entries, nat, k = 5,
          beam = if (np >= 16) 32 else 16, hops = 4, nprobe = np)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[nswrecall] cells=$cells nprobe=$np recall5=${(got & brute).size}/${brute.size} " +
        f"wall=${(System.nanoTime - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
