package graft

import org.apache.spark.sql.functions._
import graft.plans.VecMeanAgg

/** The primitive-state centroid-mean aggregate (plans/VecMeanAgg):
  * element-wise mean per group with a mutable double[] state — the
  * Lloyd-round kernel. Laws: matches the explode+avg oracle spelling,
  * skips null rows, nulls out empty groups, and is exact under any
  * partitioning (merge = element-wise add).
  */
class VecMeanAggSpec extends SparkSpec {
  import spark.implicits._

  test("vec_mean matches the explode+avg oracle across partitionings") {
    val df = (0L until 97L).map { i =>
      (i % 5, Seq.tabulate(7)(d => (i * 3 + d).toDouble / 4.0))
    }.toDF("g", "ve")
    val oracle = df.select(col("g"), posexplode(col("ve")))
      .groupBy("g", "pos").agg(avg("col").as("m"))
      .groupBy("g").agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("g"), expr("transform(pm, x -> x.m)").as("ce"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    for (parts <- Seq(1, 3, 16)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(VecMeanAgg.vecMean(col("ve")).as("ce"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
      assert(got.keySet == oracle.keySet)
      for (g <- got.keySet; (a, b) <- got(g).zip(oracle(g)))
        assert(math.abs(a - b) < 1e-12, s"group $g parts=$parts: $a vs $b")
    }
  }

  test("null rows are skipped; an all-null group evaluates to NULL") {
    val df = Seq(
      (0, Option(Seq(1.0, 3.0))), (0, None), (0, Option(Seq(3.0, 5.0))),
      (1, None)
    ).toDF("g", "ve")
    val rows = df.groupBy("g").agg(VecMeanAgg.vecMean(col("ve")).as("ce"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap
    assert(rows(0) == Seq(2.0, 4.0))
    assert(rows(1) == null)
  }

  test("mixed dimensions fail fast instead of silently padding") {
    val df = Seq((0, Seq(1.0, 2.0)), (0, Seq(1.0, 2.0, 3.0))).toDF("g", "ve")
    val e = intercept[Exception] {
      df.coalesce(1).groupBy("g").agg(VecMeanAgg.vecMean(col("ve"))).collect()
    }
    assert(e.getMessage != null)
  }
}
