package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar array/map long tail of the reference surface
  * (presto-docs/src/main/sphinx/functions/array.rst and map.rst;
  * reference impls under presto-main/.../operator/scalar/ e.g.
  * ArrayHasDuplicatesFunction.java:1, ArrayMaxByFunction.java? — the
  * functions are small row-local kernels there too). All are pure
  * compositions of Spark HOFs over the row's own array — no joins, no
  * shuffles, codegen'd where the HOF is (Project stage), so they scale
  * with the scan.
  *
  * Helpers take the COLUMN NAME (not a Column) so they compose inside
  * larger `expr(...)` fragments, matching the Text.shinglesSql style.
  *
  * Determinism contracts (the reference leaves several "unspecified"):
  * [[maxBy]]/[[minBy]] break f-ties toward the larger/smaller element;
  * [[leastFrequent]] orders by (frequency asc, value desc) exactly as
  * array.rst documents; [[combinations2]] emits pairs in (i, j), i<j
  * scan order.
  */
object Arrays {

  /** array_has_duplicates(a) — any element occurring more than once. */
  def hasDuplicates(a: String): Column =
    expr(s"size($a) != size(array_distinct($a))")

  /** array_top_n(a, n) — n largest elements, natural descending order. */
  def topN(a: String, n: Int): Column =
    expr(s"slice(reverse(array_sort($a)), 1, $n)")

  /** array_least_frequent(a, n) — n least frequent elements, frequency
    * ascending, equal frequencies broken toward the larger value
    * (array.rst: "element with higher value will appear before lower").
    * O(distinct·n) per row — row-local, no shuffle.
    */
  def leastFrequent(a: String, n: Int): Column =
    expr(s"""transform(slice(array_sort(
            |  transform(array_distinct($a), x -> struct(size(filter($a, y -> y = x)) AS f, x AS v)),
            |  (p, q) -> CASE WHEN p.f < q.f THEN -1 WHEN p.f > q.f THEN 1
            |                 WHEN p.v > q.v THEN -1 WHEN p.v < q.v THEN 1 ELSE 0 END),
            |  1, $n), s -> s.v)""".stripMargin)

  /** array_max_by(a, f) — element maximizing the SQL lambda body `f`;
    * ties go to the larger element (pinned; the reference leaves it
    * unspecified). `f` receives the element expression text.
    */
  def maxBy(a: String, f: String => String): Column =
    expr(s"""aggregate($a, cast(null as string), (acc, x) ->
            |  CASE WHEN acc IS NULL THEN x
            |       WHEN ${f("x")} > ${f("acc")}
            |         OR (${f("x")} = ${f("acc")} AND x > acc) THEN x ELSE acc END)""".stripMargin)

  /** array_min_by(a, f) — ties go to the smaller element. */
  def minBy(a: String, f: String => String): Column =
    expr(s"""aggregate($a, cast(null as string), (acc, x) ->
            |  CASE WHEN acc IS NULL THEN x
            |       WHEN ${f("x")} < ${f("acc")}
            |         OR (${f("x")} = ${f("acc")} AND x < acc) THEN x ELSE acc END)""".stripMargin)

  /** combinations(a, 2) — all unordered pairs as array<array>, (i, j)
    * i<j scan order. Pair count is n(n−1)/2: callers cap the input
    * (the reference caps total subgroup size at 100000 similarly).
    */
  def combinations2(a: String): Column =
    expr(s"""CASE WHEN size($a) >= 2 THEN
            |  flatten(transform(sequence(1, size($a) - 1),
            |    i -> transform(sequence(i + 1, size($a)),
            |      j -> array(element_at($a, i), element_at($a, j)))))
            |ELSE cast(array() as array<array<string>>) END""".stripMargin)

  /** find_first_index(a, pred) — 1-based index of the first element
    * satisfying `pred`, NULL when none (array.rst semantics).
    */
  def findFirstIndex(a: String, pred: String => String): Column =
    expr(s"""CASE WHEN size($a) = 0 THEN CAST(NULL AS INT)
            |ELSE nullif(aggregate(sequence(1, size($a)), 0,
            |  (acc, i) -> CASE WHEN acc = 0 AND ${pred(s"element_at($a, i)")} THEN i ELSE acc END), 0)
            |END""".stripMargin)

  /** remove_nulls(a). */
  def removeNulls(a: String): Column = expr(s"filter($a, x -> x IS NOT NULL)")

  /** trim_array(a, n) — drop n elements from the end. */
  def trimArray(a: String, n: Int): Column =
    expr(s"slice($a, 1, greatest(size($a) - $n, 0))")

  /** map_top_n_keys(m, n) — n largest keys, descending. */
  def mapTopNKeys(m: String, n: Int): Column =
    expr(s"slice(reverse(array_sort(map_keys($m))), 1, $n)")

  /** map_top_n_values(m, n) — n largest values, descending. */
  def mapTopNValues(m: String, n: Int): Column =
    expr(s"slice(reverse(array_sort(map_values($m))), 1, $n)")

  /** map_keys_by_top_n_values(m, n) — keys of the n largest values,
    * equal values broken toward the higher key (map.rst).
    */
  def mapKeysByTopNValues(m: String, n: Int): Column =
    expr(s"""transform(slice(array_sort(map_entries($m),
            |  (p, q) -> CASE WHEN p.value > q.value THEN -1 WHEN p.value < q.value THEN 1
            |                 WHEN p.key > q.key THEN -1 WHEN p.key < q.key THEN 1 ELSE 0 END),
            |  1, $n), e -> e.key)""".stripMargin)

  /** map_remove_null_values(m). */
  def mapRemoveNullValues(m: String): Column =
    expr(s"map_filter($m, (k, v) -> v IS NOT NULL)")
}
