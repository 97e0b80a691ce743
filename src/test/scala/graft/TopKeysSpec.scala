package graft

import org.apache.spark.sql.functions._

import graft.operators.TopKeys

/** Contract of the thin-keys prefilter (operators/TopKeys.scala) — the
  * manual LIMIT-below-aggregate push for "GROUP BY k … LIMIT K":
  *  - exactly the K smallest distinct keys, under any partitioning;
  *  - the plan is a TakeOrderedAndProject over the key column only
  *    (never a global range sort — that is the full-width shuffle the
  *    helper exists to eliminate);
  *  - joining it back broadcast yields the same rows as the naive
  *    aggregate-then-limit plan.
  */
class TopKeysSpec extends SparkSpec {
  import spark.implicits._

  test("returns exactly the K smallest distinct keys, any partitioning") {
    val rows = (1 to 4000).map(i => (i.toLong % 500, i.toString))
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("k", "payload").repartition(parts)
      val got = TopKeys.smallest(df, "k", 20).as[Long].collect().sorted.toSeq
      assert(got == (0L to 19L).toSeq, s"parts=$parts: $got")
    }
  }

  test("smallestBy honors a custom key order") {
    val df = (1L to 100L).toDF("k")
    val got = TopKeys.smallestBy(df, col("k").desc, "k", 3)
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(98L, 99L, 100L))
  }

  test("plans as TakeOrderedAndProject on the key column, not a global sort") {
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plan = TopKeys.smallest(fact, "l_orderkey", 300)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject (ordered limit), got:\n$plan")
    // the only columns in flight are the key itself: a wide ReadSchema
    // here would mean the prefilter scan lost its column pruning
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"prefilter scan must read only the key column:\n$plan")
  }

  test("broadcast join-back equals the naive aggregate-then-limit result") {
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val naive = fact.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"), collect_list("l_partkey").as("parts"))
      .orderBy("l_orderkey").limit(50)
      .select(col("l_orderkey"), col("q"), sort_array(col("parts")).as("parts"))
    val pushed = fact
      .join(broadcast(TopKeys.smallest(fact, "l_orderkey", 50)), "l_orderkey")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"), collect_list("l_partkey").as("parts"))
      .select(col("l_orderkey"), col("q"), sort_array(col("parts")).as("parts"))
    val a = naive.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = pushed.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.toSeq == b.toSeq, "thin-keys push changed the result")
  }

  test("kSmallestPairs matches collect_list+sort+slice under any partitioning") {
    // the bounded-state per-group top-k fold (r8, the q117 fix): same
    // answer as the full-collect spelling, including groups smaller
    // than k (sentinel padding must vanish on read)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 3000).map { i =>
      (i % 7, rnd.nextDouble() * 1000, i.toLong)
    } ++ Seq((98, 5.0, 90001L), (99, 1.0, 90002L), (99, 2.0, 90003L)) // groups with < k rows
    for (parts <- Seq(1, 8, 32)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val got = df.groupBy(col("g"))
        .agg(TopKeys.kSmallestPairs(col("v"), col("id"), 3).as("state"))
        .select(col("g"), expr(
          s"transform(filter(state, x -> x.b != ${Long.MaxValue}L), x -> x.b)").as("ids"))
        .collect().map(r => r.getAs[Int]("g") -> r.getAs[Seq[Long]]("ids").toList).toMap
      val want = df.groupBy(col("g"))
        .agg(expr("transform(slice(array_sort(collect_list(struct(v, id))), 1, 3), x -> x.id)").as("ids"))
        .collect().map(r => r.getAs[Int]("g") -> r.getAs[Seq[Long]]("ids").toList).toMap
      assert(got == want, s"parts=$parts")
    }
  }
}
