package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.operators.Ann

/** ANN recall under an anisotropic eigenspectrum (r11 VERDICT item 6):
  * PQ slices vectors into consecutive-dim subvectors, so a spectrum
  * concentrated in the leading dimensions starves the tail
  * subquantizers of variance — the failure OPQ's learned rotation
  * (Ge et al., CVPR 2013) exists to fix. This probe measures recall@5
  * of the PQ family on the sf1 isotropic set vs the geometrically
  * decaying `embeddings_aniso` set (tools/gen_sf1.py, w_d = 0.93^d).
  * IVF (whole-vector centroids, rotation-invariant) runs as the
  * control: a drop confined to the PQ rows is subspace starvation; a
  * drop in IVF too would be a data problem. The keep/implement
  * adjudication lives in BENCHNOTES.md.
  */
object AnisoProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse("target/testdata/sf1")
    def recallOf(exact: Set[(Long, Long)], df: DataFrame): Double = {
      val s = df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      (exact & s).size.toDouble / exact.size
    }
    for ((name, path) <- Seq(
        "isotropic" -> s"$dir/embeddings.parquet",
        "anisotropic" -> s"$dir/embeddings_aniso.parquet")) {
      val embs = spark.read.parquet(path)
      val queries = embs.filter(col("vec_id") < 20)
      val exact = Ann.bruteKnn(embs, queries, k = 5).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
      // q138 / q142 / q87 configurations, sample-trained as at scale
      val pq = recallOf(exact,
        Ann.pqKnn(embs, queries, k = 5, m = 32, ksub = 16, trainMod = 4))
      val ivfpq = recallOf(exact,
        Ann.ivfPqKnn(embs, queries, k = 5, trainMod = 4))
      val ivf = recallOf(exact,
        Ann.ivfKnn(embs, queries, k = 5, c = 16, nprobe = 4, trainMod = 4))
      // the rotation hook (orthonormal → same metric, redistributed
      // subspace variance); recall still scores against the UNROTATED
      // exact set — ids are rotation-invariant
      val rEmbs = Ann.rotateEmbeddings(embs)
      val rQueries = Ann.rotateEmbeddings(queries)
      val pqRot = recallOf(exact,
        Ann.pqKnn(rEmbs, rQueries, k = 5, m = 32, ksub = 16, trainMod = 4))
      val ivfpqRot = recallOf(exact,
        Ann.ivfPqKnn(rEmbs, rQueries, k = 5, trainMod = 4))
      println(f"[aniso] $name%-12s pq=$pq%.3f ivfpq=$ivfpq%.3f " +
        f"pq_rot=$pqRot%.3f ivfpq_rot=$ivfpqRot%.3f ivf_control=$ivf%.3f")
      // r16 (VERDICT r15 item 7): the GRAPH family under the same
      // spectrum — a skewed eigenspectrum changes LSH/k-means cell
      // occupancy and beam behavior, which PQ rows cannot reveal. The
      // walk scores exact cosines (no subspace slicing), so any drop
      // is routing/occupancy, not code resolution — IVF stays the
      // control for the routing half.
      val nswLsh = recallOf(exact, Ann.nswKnnLsh(embs, queries, k = 5))
      val nswKm = recallOf(exact, Ann.nswKnn(embs, queries, k = 5,
        trainMod = 4))
      println(f"[aniso] $name%-12s nsw_lsh=$nswLsh%.3f nsw_kmeans=$nswKm%.3f " +
        f"ivf_control=$ivf%.3f")
      // budget sweep behind the BENCHNOTES adjudication that rotated
      // IVF-PQ's recall gap vs rotated flat PQ is the q142 CONFIG's
      // probe/code budget, not the rotation composition: nprobe=8
      // probes all c=8 cells (routing misses eliminated — any residual
      // gap is code resolution), m=32 doubles code resolution at the
      // default routing budget
      if (name == "anisotropic") {
        for ((np, mm) <- Seq((8, 16), (4, 32), (8, 32))) {
          val r = recallOf(exact, Ann.ivfPqKnn(
            rEmbs, rQueries, k = 5, nprobe = np, m = mm, trainMod = 4))
          println(f"[aniso] budget-sweep ivfpq_rot nprobe=$np%2d m=$mm%2d recall=$r%.3f")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
