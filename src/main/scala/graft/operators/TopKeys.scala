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
}
