package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin-keys prefilter for the "GROUP BY key … ORDER BY key LIMIT K"
  * query shape (the r6 shuffle-bound fix, generalized).
  *
  * Catalyst cannot push a LIMIT below a grouping aggregate on its own:
  * the naive plan shuffles the WHOLE fact table's wide aggregation
  * input just to keep K groups (q115 measured 24 MB at sf0.1; at
  * 100 TB that full-width exchange is the scale-killer). The manual
  * push: first compute the K smallest distinct key values — only the
  * key column shuffles (8-byte longs through a distinct), and the
  * final ordered limit plans as a TakeOrderedAndProject, never a
  * global sort — then broadcast-semi-join the K keys back against the
  * fact scan so the wide aggregation only ever sees K groups' rows.
  *
  * Usage: `fact.join(broadcast(TopKeys.smallest(fact, "k", K)), "k")`.
  * K must be broadcast-sized (thousands, not millions) — the result is
  * collected to every executor.
  */
object TopKeys {

  /** The `k` smallest distinct values of `key`, as a one-column
    * broadcast-able frame (column name preserved for a natural join).
    */
  def smallest(df: DataFrame, key: String, k: Int): DataFrame =
    smallestBy(df, col(key).asc, key, k)

  /** General form: the `k` first distinct values of `key` under
    * `order` (any sort expression over the key column).
    */
  def smallestBy(df: DataFrame, order: Column, key: String, k: Int): DataFrame =
    df.select(col(key)).distinct().orderBy(order).limit(k)

  /** Bounded-state per-group "k smallest (sort, id) pairs" AGGREGATE —
    * the thin-state companion to the prefilter above, for the
    * per-group top-k-values shape (`collect_list` + sort + slice
    * computes it by shipping the ENTIRE value list per group through
    * the exchange; this fold ships at most k structs per group per
    * partition, with map-side partial combine — r8, the q117 fix).
    *
    * The fold state is the current k-smallest array of struct(a, b)
    * under lexicographic order — a double sort value (negate it for
    * descending) and a long id that doubles as the unique tie-break.
    * `Reduce.reduceAgg` needs a LITERAL merge-identity init and an
    * empty typed array literal cannot be spelled at the Column level,
    * so init is one sentinel struct (Double.MaxValue, Long.MaxValue),
    * built as a catalyst Literal (a Column-DSL array(struct(…)) stays
    * unresolved pre-analysis and fails reduceAgg's foldable check):
    * it sorts AFTER every real value, partial states carry up to k−1
    * trailing sentinels (slice keeps them only while fewer than k
    * reals exist), and readers filter `b = Long.MaxValue` out.
    *
    * Order-insensitive update, associative+commutative merge (top-k
    * of a union), so results are deterministic under any partitioning.
    */
  def kSmallestPairs(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val stype = StructType(Seq(
      StructField("a", DoubleType, nullable = true),
      StructField("b", LongType, nullable = true)))
    val init = org.apache.spark.sql.graft.Bridge.column(
      Literal(new GenericArrayData(
        Array[Any](InternalRow(Double.MaxValue, Long.MaxValue))),
        ArrayType(stype, containsNull = true)))
    val input = array(struct(a.cast("double").as("a"), b.cast("bigint").as("b")))
    val step = (s: Column, v: Column) =>
      slice(array_sort(concat(s, v)), 1, k)
    graft.plans.Reduce.reduceAgg(input, init)(step, step)
  }
}
