package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q158's histogram-overlap trimmed mean vs the naive rank definition.
  *
  * The query computes kept(v) = overlap of v's cumulative-rank interval
  * with (⌊n/10⌋, n−⌊n/10⌋] over the per-group VALUE HISTOGRAM (so the
  * big table never funnels through per-group rank reducers); this spec
  * proves that formulation identical to the definitional "sort, drop
  * the lowest/highest ⌊n/10⌋ rows, average the rest" on random
  * tie-heavy multisets.
  */
class TrimmedMeanSpec extends SparkSpec {

  private def histogramTrimmed(df: org.apache.spark.sql.DataFrame) = {
    val wc = Window.partitionBy("grp").orderBy("q")
    val wn = Window.partitionBy("grp")
    df.groupBy("grp", "q").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wc))
      .withColumn("n", sum(col("c")).over(wn))
      .withColumn("kept",
        expr("greatest(least(cum, n - (n div 10)) - greatest(cum - c, n div 10), 0)"))
      .groupBy("grp")
      .agg(sum(col("kept")).cast("long").as("n_kept"),
        (sum(col("q") * col("kept")).cast("double") / sum(col("kept"))).as("mean"))
  }

  test("histogram overlap == sort-drop-average on tie-heavy random groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val rows = for {
      g <- Seq("A", "B", "C")
      i <- 1 to (200 + rnd.nextInt(200))
    } yield (g, (1 + rnd.nextInt(10)).toLong) // 10 distinct values → heavy ties
    val got = histogramTrimmed(rows.toDF("grp", "q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val drop = sorted.length / 10
      val kept = sorted.slice(drop, sorted.length - drop)
      val (nk, mean) = got(g)
      assert(nk == kept.length, s"group $g n_kept")
      assert(math.abs(mean - kept.sum.toDouble / kept.length) < 1e-9, s"group $g mean")
    }
  }

  test("degenerate groups: single value, all ties, n < 10 (trim drops nothing)") {
    import spark.implicits._
    val rows = Seq.fill(7)(("S", 5L)) ++ // n=7 < 10 → ⌊n/10⌋ = 0, keep all
      Seq.tabulate(40)(i => ("T", 3L)) // all-tie group: trim still keeps n−2⌊n/10⌋
    val got = histogramTrimmed(rows.toDF("grp", "q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("S") == ((7L, 5.0)))
    assert(got("T") == ((32L, 3.0)))
  }
}
