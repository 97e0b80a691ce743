package graft.tools
import org.apache.spark.sql.functions.col
import graft._
import graft.operators.Ann
object NswLshProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val twins = embs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val bits = math.max(3, math.ceil(
      math.log(math.sqrt(embs.count().toDouble)) / math.log(2)).toInt)
    val index = Ann.nswLshIndex(embs, bits).persist(); index.count()
    val sizes = index.groupBy(col("cluster")).count().collect().map(_.getLong(1))
    println(s"[lsh] bits=$bits buckets=${sizes.length} min=${sizes.min} max=${sizes.max}")
    val edges = Ann.nswBuild(index, 12, 2).persist(); edges.count()
    for (pc <- Seq(16); hp <- Seq(3)) {
      val got = Ann.nswSearchLsh(edges, index, Ann.nswEntriesSampled(index, pc), twins,
          k = 5, nBits = bits, beam = 16, hops = hp)
        .filter(col("rn") === 1).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val hit = got.count { case (q, c) => c == q - 1000000L }
      println(s"[lsh] sampleMod=$pc hops=$hp hits=$hit/10")
    }
    spark.stop()
  }
}
