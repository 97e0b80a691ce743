package graft.tools
import org.apache.spark.sql.functions.col
import graft._
import graft.operators.Ann
object NswPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val twins = embs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime; val r = body
      println(f"[phase] $name%-8s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val n = embs.count()
    val cells = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    val cents = t("fit") { Ann.ivfFit(embs, cells, iters = 2, trainMod = 4) }
    val index = t("encode") {
      val i = Ann.ivfEncode(embs, cents).persist(); i.count(); i }
    val edges = t("build") { val e = Ann.nswBuild(index, 12, 3); e.count(); e }
    val out = t("search") {
      Ann.nswSearch(cents, edges, index, Ann.nswEntries(index), twins,
        k = 5, beam = 16, hops = 4, nprobe = 4).collect() }
    println(s"[phase] rows=${out.length}")
    spark.stop()
  }
}
