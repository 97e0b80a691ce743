package graft

import org.apache.spark.sql.functions.col

/** The 22 TPC-H shapes as LITERAL SQL text through spark.sql() — the
  * reference is a SQL engine (its canonical suite ships as .sql files:
  * presto-benchto-benchmarks/src/main/resources/sql/presto/tpch/
  * q01.sql … q22.sql), so a reference user's first migration step is
  * pasting SQL, not porting DataFrame programs. Each shape's oracle
  * text (already ANSI — the same string DuckDB replays every round)
  * runs through the Spark SQL front door against temp views and must
  * match the registered DataFrame program's rows exactly.
  *
  * The four partsupp-derived shapes (Q2/Q11/Q16/Q20) carry a mechanical
  * dialect fixup: DuckDB's `//` integer division → `div`, and
  * `unnest(range(...))` → `explode(sequence(...))`. Everything else
  * runs verbatim.
  */
class TpchSqlSpec extends SparkSpec {

  // TPC-H number → registered query key (SURVEY §2.8 mapping)
  private val shapes: Seq[(Int, String)] = Seq(
    1 -> "q02_tpch_q1", 2 -> "q183_tpch_q2", 3 -> "q03_tpch_q3",
    4 -> "q04_semi_join", 5 -> "q05_tpch_q5", 6 -> "q06_tpch_q6",
    7 -> "q72_tpch_q7", 8 -> "q73_tpch_q8", 9 -> "q74_tpch_q9",
    10 -> "q75_tpch_q10", 11 -> "q184_tpch_q11", 12 -> "q76_tpch_q12",
    13 -> "q77_tpch_q13", 14 -> "q78_tpch_q14", 15 -> "q79_tpch_q15",
    16 -> "q185_tpch_q16", 17 -> "q17_scalar_subquery",
    18 -> "q18_in_subquery", 19 -> "q80_tpch_q19", 20 -> "q186_tpch_q20",
    21 -> "q81_tpch_q21", 22 -> "q82_tpch_q22")

  private lazy val byName: Map[String, Q] =
    (queries.RelationalQueries.all ++ queries.TpchQueries.all)
      .map(q => q.name -> q).toMap

  private def registerTables(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** DuckDB → Spark dialect: only the partsupp derivation needs it. */
  private def sparkDialect(sql: String): String = sql
    .replace("s // 4", "s div 4")
    .replace("(p_partkey - 1) // s", "(p_partkey - 1) div s")
    .replace("unnest(range(0, 4)) AS t(i)", "(SELECT explode(sequence(0, 3)) AS i) t")

  for ((num, key) <- shapes)
    test(f"TPC-H Q$num%02d as literal SQL == the $key DataFrame program") {
      registerTables()
      val q = byName(key)
      val sqlText = sparkDialect(q.oracle.getOrElse(fail(s"$key has no oracle")))
      val df = q.fn(spark, sfDir)
      // align the SQL result to the program's column order and types
      // (the driver's own compare is sorted-by-name; here we go exact)
      val sqlDf = spark.sql(sqlText)
        .select(df.schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
      // canonical-sort both sides (the driver's compare does the same):
      // ORDER BY columns rarely form a total order, and tied rows may
      // come back in different physical orders from the two plans
      val got = sqlDf.collect().toSeq.sortBy(_.toString)
      val want = df.collect().toSeq.sortBy(_.toString)
      assert(got == want,
        s"SQL text vs DataFrame program diverged for $key:\n" +
          s"sql  ${got.take(5)}\nprog ${want.take(5)}")
      if (want.isEmpty) info(s"$key returned zero rows at $sfDir (selective filter at tiny SF)")
    }

  test("the SQL-text sweep covers all 22 TPC-H shapes") {
    assert(shapes.map(_._1).sorted == (1 to 22))
    assert(shapes.map(_._2).distinct.length == 22)
  }
}
