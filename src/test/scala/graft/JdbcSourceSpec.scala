package graft

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** JDBC source round-trip + pushdown (§2.4), against embedded Derby
  * (the only JDBC engine in the container).
  */
class JdbcSourceSpec extends SparkSpec {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("jdbc round-trip preserves rows") {
    val nation = Tables.nation(spark, sfDir).orderBy("n_nationkey")
    Jdbc.write(nation, url, "nation_rt")
    val back = Jdbc.read(spark, url, "nation_rt")
    assert(back.count() === nation.count())
    assert(back.orderBy("n_nationkey").collect().toSeq == nation.collect().toSeq)
  }

  test("jdbc read pushes filters to the database") {
    val nation = Tables.nation(spark, sfDir)
    Jdbc.write(nation, url, "nation_pd")
    val filtered = Jdbc.read(spark, url, "nation_pd")
      .filter(col("n_nationkey") > 10)
      .select("n_nationkey", "n_name")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan"),
      s"expected JDBC filter pushdown in plan:\n$scan")
    assert(filtered.count() ===
      nation.filter(col("n_nationkey") > 10).count())
  }

  test("jdbc partitioned read splits into parallel range scans") {
    val nation = Tables.nation(spark, sfDir)
    Jdbc.write(nation, url, "nation_pp")
    val part = Jdbc.readPartitioned(spark, url, "nation_pp",
      "n_nationkey", lower = 0, upper = 24, numPartitions = 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === nation.count())
  }
}
