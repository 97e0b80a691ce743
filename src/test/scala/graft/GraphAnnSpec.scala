package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Partitioned-NSW graph ANN (r14): cell-local ring init + sampled
  * NN-Descent + centroid-routed beam search. The planted-twin top-1 law
  * is oracled by q203; these pin the structural laws.
  */
class GraphAnnSpec extends SparkSpec {

  private def embs = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))
  private def queries = embs.filter(col("vec_id") < 8)

  test("graph build: degree bounded by kNbr, no self-edges, edges deterministic") {
    val index = Ann.nswLshIndex(embs, nBits = 4)
    val e1 = Ann.nswBuild(index, kNbr = 6, rounds = 2)
    val rows = e1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.nonEmpty)
    assert(!rows.exists(p => p._1 == p._2), "self-edge leaked")
    val deg = rows.groupBy(_._1).map(_._2.size)
    // refined top-kNbr links + the permanent ring spine
    assert(deg.max <= 12, s"degree ${deg.max} > 2*kNbr")
    val e2 = Ann.nswBuild(index, kNbr = 6, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.sorted == e2.sorted, "build is not deterministic")
  }

  test("search output shape: <= k rows per query, rn contiguous, sims non-increasing") {
    val got = Ann.nswKnnLsh(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.nonEmpty)
    for ((q, rows) <- byQ) {
      assert(rows.length <= 5, s"$q returned ${rows.length} rows")
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length), s"$q rn gap")
      val sims = rows.sortBy(_._4).map(_._3)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, s"$q sims not sorted")
      assert(!rows.exists(_._2 == q), s"$q returned itself")
    }
  }

  test("planted twins surface top-1 at sim 1.0 through the graph walk") {
    val twins = queries.select((col("vec_id") + 1000000L).as("vec_id"),
      col("embedding"))
    val got = Ann.nswKnnLsh(embs, twins, k = 3)
      .filter(col("rn") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = queries.select("vec_id").collect()
      .map(r => (r.getLong(0) + 1000000L, r.getLong(0), 1.0)).toSet
    assert(got == want, s"twin walk failed: $got")
  }
}
