package graft

import graft.operators.Components

/** Planted-graph correctness for the dedup-clustering operator. */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("chain, triangle and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12 + chord, pair 20-21
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("a", "b")
    val comp = Components.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L), comp)
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L), comp)
    assert(Seq(20L, 21L).forall(comp(_) == 20L), comp)
  }

  test("dedupClusters reports per-cluster sizes") {
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val rows = Components.dedupClusters(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows === Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  test("a 40-node chain converges within 10 rounds (pointer jumping: log diameter)") {
    val n = 40
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    // without path compression this chain needs ~39 rounds; maxIter=10
    // only passes because pointer jumping halves the depth per round
    val comp = Components.connectedComponents(edges, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to n).forall(i => comp(i.toLong) == 1L))
  }
}
