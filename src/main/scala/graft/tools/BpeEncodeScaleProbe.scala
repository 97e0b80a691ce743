package graft.tools

import org.apache.spark.sql.functions._

import graft._

/** Diagnostic: `graft_bpe_encode` at PRODUCTION merge counts — the
  * measurement behind SURVEY's "a real 32k-merge vocabulary is
  * reachable on the APPLY path" claim, which BpeSpec pins only to a
  * bounded-time case at M=1050. The real corpus exhausts at ~89
  * trainable merges, so large-M lists are built synthetically but
  * CHAINED the way trained lists are (every fused symbol exists
  * before any merge that consumes it): level 1 ranks all 36×36
  * single-char pairs, level 2 pairs the level-1 fusions — on natural
  * words the level-1 table makes every adjacent pair mergeable, so
  * the greedy loop runs to its O(len²) worst case with a full-size
  * rank table, exactly the claimed cost model.
  *
  * Prints wall seconds per M and asserts the char-mass invariant
  * (Σ freq·|token| is M-independent: merges only concatenate), so a
  * kernel bug at large M cannot hide behind a timing table.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.BpeEncodeScaleProbe [M...]
  */
object BpeEncodeScaleProbe {

  /** Deterministic chained merge list: 1296 char-pair merges, then
    * pairs of the 2-char fusions, rank order = enumeration order.
    */
  def chainedMerges(m: Int): Seq[(String, String)] = {
    val alpha = ('a' to 'z') ++ ('0' to '9')
    val lvl1 = for (a <- alpha; b <- alpha) yield (a.toString, b.toString)
    val fused = lvl1.map { case (a, b) => a + b }
    val lvl2 = for (i <- fused.indices.take(190); j <- fused.indices.take(190))
      yield (fused(i), fused(j))
    val all = lvl1 ++ lvl2
    require(all.length >= m, s"chainedMerges: can construct ${all.length} < $m")
    all.take(m)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(512, 4096, 32768)
    val docs = Tables.documents(spark, d).persist()
    docs.count()

    var massSeen = Option.empty[Long]
    for (m <- sizes) {
      val merges = chainedMerges(m)
      val t0 = System.nanoTime()
      val row = graft.operators.Bpe.encodeTokenFreq(docs, merges)
        .agg(sum(expr("freq * length(token)")).as("char_mass"),
             count(lit(1)).as("distinct_tokens"),
             sum(col("freq")).as("total_tokens"))
        .collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val mass = row.getLong(0)
      println(f"[bpe-encode-scale] M=$m%6d wall=$secs%6.2fs distinct_tokens=${row.getLong(1)}%7d total_tokens=${row.getLong(2)}%9d char_mass=$mass")
      massSeen match {
        case Some(prev) => assert(prev == mass,
          s"char-mass invariant broken: $prev != $mass at M=$m")
        case None => massSeen = Some(mass)
      }
    }
    spark.stop()
  }
}
