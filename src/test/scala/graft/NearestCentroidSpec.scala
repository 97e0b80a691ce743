package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.plans.NativeFunctions

/** Decision-equivalence of the join-free assignment kernel (r17 opt).
  *
  * The k-means assignment/encode steps were rewritten from
  * `join(broadcast(cents)) → score → groupBy(id).agg(max/min(struct))`
  * to one NearestCentroidId kernel call per row. Every fitted-model
  * consumer (recall reports, SemDeDup clusters, probe sets) replays the
  * OLD models only if the argbest decisions are bit-identical — this
  * spec pins the kernel against the struct-aggregation reference
  * formulation on real embeddings, for both metrics, flat and grouped,
  * including exact-tie inputs where only the id tie-break decides.
  */
class NearestCentroidSpec extends SparkSpec {

  private def embs = Tables.embeddings(spark, sfDir)
  private def vecs: DataFrame =
    embs.select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))

  test("flat cosine argmax == join + max(struct(sim, cid)) reference") {
    import spark.implicits._
    // deliberately ugly centroids: duplicates force exact sim ties so
    // the max-id tie-break is exercised on every row
    val base = vecs.orderBy("vec_id").limit(6)
      .as[(Long, Seq[Double])].collect().toSeq.map(_._2)
    val cents = (base ++ base.take(2)).zipWithIndex.map { case (v, i) => (i, v) }
    val centDf = broadcast(cents.toDF("cid", "ce"))
    val ref = vecs.join(centDf)
      .withColumn("sim", NativeFunctions.cosineSim(col("ve"), col("ce")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cid"))
    val got = vecs.select(col("vec_id"),
      NativeFunctions.nearestCentroid(col("ve"), cents).as("cid"))
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty,
      "kernel argmax diverges from the struct-agg reference")
  }

  test("grouped l2 argmin == join + min(struct(d2, cid)) reference (PQ shape)") {
    import spark.implicits._
    val m = 8; val dim = 64; val sublen = dim / m
    val sv = vecs.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${m - 1}), s -> struct(s AS sub, slice(ve, s * $sublen + 1, $sublen) AS sv))")).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
    val init = sv.filter(col("vec_id") < 4)
      .as[(Long, Int, Seq[Double])].collect().toSeq
      .groupBy(_._2).toSeq.flatMap { case (sub, rows) =>
        rows.sortBy(_._1).zipWithIndex.map { case ((_, _, v), i) => (sub, i, v) }
      }
    // duplicate one codebook entry per sub — exact d2 ties, min-id wins
    val cents = init ++ init.filter(_._2 == 0).map { case (s, _, v) => (s, 4, v) }
    val centDf = broadcast(cents.toDF("sub", "cid", "ce"))
    val ref = sv.join(centDf, Seq("sub"))
      .withColumn("d2", NativeFunctions.l2Sq(col("sv"), col("ce")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cid").as("cid"))
    val got = sv.select(col("vec_id"), col("sub"),
      NativeFunctions.nearestCentroidBy(
        col("sub"), col("sv"), cents, useCos = false).as("cid"))
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty,
      "grouped kernel argmin diverges from the struct-agg reference")
  }

  test("ivfFit remains layout-independent and pqFit model replays through encode") {
    // end-to-end: the rewritten fit must still produce grid-quantized,
    // layout-independent models, and encode must assign every vector
    val a = Ann.ivfFit(embs.repartition(3), c = 8, iters = 2)
    val b = Ann.ivfFit(embs.repartition(13), c = 8, iters = 2)
    assert(a == b, "kernel-based ivfFit is layout-dependent")
    val n = embs.count()
    val enc = Ann.ivfEncode(embs, a)
    assert(enc.count() == n && enc.select("vec_id").distinct().count() == n)
    val pq = Ann.pqFit(embs, m = 8, ksub = 4, iters = 2)
    val codes = Ann.pqEncode(embs, pq, m = 8)
    assert(codes.count() == n * 8, "pqEncode must emit m rows per vector")
  }
}
