package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.plans.NativeFunctions

/** Mergeability + determinism + accuracy of the KMV bottom-k sketch
  * (graft.plans.KmvSketchAgg — the theta-sketch/setdigest analog).
  */
class KmvSpec extends SparkSpec {

  private val k = 64

  private def hashed = Tables.orders(spark, sfDir)
    .select(col("o_orderpriority").as("grp"), Sketches.hllHash("o_custkey").as("h"))

  test("sketch is partition-invariant (1 vs 32 partitions, identical state)") {
    def sk(parts: Int) = hashed.repartition(parts)
      .agg(NativeFunctions.kmvSketch(col("h"), k).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(sk(1) === sk(32))
  }

  test("re-aggregating sketch elements is the lossless union merge") {
    val perGroup = hashed.groupBy("grp")
      .agg(NativeFunctions.kmvSketch(col("h"), k).as("sk"))
    val merged = perGroup.select(explode(col("sk")).as("h"))
      .agg(NativeFunctions.kmvSketch(col("h"), k).as("sk"))
      .collect()(0).getSeq[Long](0)
    val direct = hashed.agg(NativeFunctions.kmvSketch(col("h"), k).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(merged === direct)
  }

  test("distinct estimate is exact below k and within 4/sqrt(k) above") {
    val est = hashed
      .agg(NativeFunctions.kmvSketch(col("h"), k).as("sk"))
      .select(Sketches.kmvEstimate("sk", k).as("est"))
      .collect()(0).getLong(0)
    val exact = Tables.orders(spark, sfDir)
      .agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    if (exact < k) assert(est === exact)
    else {
      val tol = 4.0 / math.sqrt(k) // ~4 standard errors for KMV
      assert(math.abs(est - exact) <= math.max(2L, (exact * tol).toLong),
        s"estimate $est vs exact $exact")
    }
  }

  test("jaccard of a set with itself is 1; disjoint sets are 0") {
    val sk = hashed.agg(NativeFunctions.kmvSketch(col("h"), k).as("a"))
      .withColumn("b", col("a"))
      .select(Sketches.kmvJaccard("a", "b", k).as("j"))
      .collect()(0).getDouble(0)
    assert(sk === 1.0)
    import spark.implicits._
    val disjoint = Seq((Seq(1L, 2L, 3L), Seq(10L, 20L, 30L))).toDF("a", "b")
      .select(Sketches.kmvJaccard("a", "b", k).as("j"))
      .collect()(0).getDouble(0)
    assert(disjoint === 0.0)
  }

  test("intersection_cardinality estimate is EXACT when k covers the union (q160 law)") {
    import spark.implicits._
    // |A| = 40, |B| = 35, |A∩B| = 15; k = 128 ≥ |A∪B| = 60 → every term
    // of round(jaccard × unionEst) is exact, so the estimate must equal 15
    val a = (1 to 40).map(_.toLong)
    val b = (26 to 60).map(_.toLong)
    val df = Seq((a, b)).toDF("ids_a", "ids_b")
      .select(
        expr("transform(ids_a, v -> cast(conv(substr(md5(cast(v as string)), 1, 15), 16, 10) as bigint))").as("ha"),
        expr("transform(ids_b, v -> cast(conv(substr(md5(cast(v as string)), 1, 15), 16, 10) as bigint))").as("hb"))
      .select(sort_array(col("ha")).as("a"), sort_array(col("hb")).as("b"))
      .withColumn("m", expr(s"slice(array_sort(array_union(a, b)), 1, $k)"))
      .select(round(Sketches.kmvJaccard("a", "b", k) *
        Sketches.kmvEstimate("m", k)).cast("bigint").as("inter"))
    assert(df.collect()(0).getLong(0) == 15L)
  }

  test("graft_kmv is registered as a SQL function") {
    Tables.orders(spark, sfDir).createOrReplaceTempView("kmv_orders")
    val n = spark.sql(
      s"""SELECT size(graft_kmv(h, $k)) AS n FROM (
         |  SELECT cast(conv(substr(md5(cast(o_custkey as string)), 1, 15), 16, 10) as bigint) AS h
         |  FROM kmv_orders)""".stripMargin)
      .collect()(0).getInt(0)
    assert(n === k)
  }
}
