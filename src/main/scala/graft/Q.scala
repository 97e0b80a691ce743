package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered query: a DataFrame program plus (optionally) the
  * equivalent DuckDB SQL oracle. Column names must align between the two
  * (the driver sorts columns by name and hashes values).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** Exact money arithmetic: cast the 2-decimal doubles to decimal so sums
    * and products are associative/exact, identical in Spark and DuckDB.
    * (Test money columns are generated with 2 decimals — SURVEY.md §4.)
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact decimal aggregate → stable double output, rounded. */
  def money(c: Column, scale: Int = 2): Column = round(c.cast("double"), scale)

  /** avg over exact decimal sum: round(sum_dec_as_double / count, 6). */
  def avg6(sumDec: Column, cnt: Column): Column =
    round(sumDec.cast("double") / cnt, 6)
}

/** A family of queries (relational core, functions, dedup, …). */
trait QueryFamily {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
