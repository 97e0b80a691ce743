package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every registered [[QueryFamily]]. Each family pairs a
  * DataFrame program with a DuckDB oracle (or a rows-only check where the
  * output is not SQL-expressible, e.g. sketches).
  */
object SparkEntry {
  private val families: Seq[QueryFamily] = Seq(
    RelationalQueries, FunctionQueries, AggregateQueries, PipelineQueries,
    EventQueries, TpchQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q02.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.oracles).toMap
}
