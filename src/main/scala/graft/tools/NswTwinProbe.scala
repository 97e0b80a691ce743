package graft.tools
import org.apache.spark.sql.functions.col
import graft._
import graft.operators.Ann
object NswTwinProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val twins = embs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val cells = math.max(8, math.ceil(math.sqrt(embs.count().toDouble)).toInt)
    val cents = Ann.ivfFit(embs, cells, iters = 2, trainMod = 4)
    val index = Ann.ivfEncode(embs, cents).persist(); index.count()
    val edges = Ann.nswBuild(index, 12, 3).persist(); edges.count()
    val entries = Ann.nswEntries(index)
    for (bm <- Seq(16, 16, 16, 32, 32, 32)) {
      // fresh fit each trial so centroid float-noise is sampled too
      val c2 = Ann.ivfFit(embs, cells, iters = 2, trainMod = 4)
      val i2 = Ann.ivfEncode(embs, c2).persist(); i2.count()
      val e2 = Ann.nswBuild(i2, 12, 3)
      val got = Ann.nswSearch(c2, e2, i2, Ann.nswEntries(i2), twins, k = 5,
          beam = bm, hops = 4, nprobe = 4)
        .filter(col("rn") === 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      i2.unpersist(blocking = true)
      val hit = got.count { case (q, c, s) => c == q - 1000000L && s == 1.0 }
      println(s"[twin] beam=$bm hits=$hit/10")
    }
    spark.stop()
  }
}
