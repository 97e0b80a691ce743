package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, QueryFamily, Tables}

/** §2.1 Relational core.
  *
  * Re-expresses the reference's execution operators
  * (reference: presto-main/src/main/java/com/facebook/presto/operator/
  * ScanFilterAndProjectOperator.java:1, HashAggregationOperator.java:1,
  * LookupJoinOperator.java:1, TopNOperator.java:1, WindowOperator.java:1,
  * unnest/UnnestOperator.java:1) as declarative DataFrame programs so
  * Catalyst supplies pushdown, pruning, join selection and AQE.
  *
  * Determinism contract (SURVEY.md §4): money math in exact decimal, final
  * outputs rounded doubles, every output fully ordered on a unique key,
  * every computed column aliased identically in Spark and oracle SQL.
  */
object RelationalQueries extends QueryFamily {

  // ---- shared exact-decimal helpers (Spark side) ----
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
  private def frac(c: org.apache.spark.sql.Column) = c.cast("decimal(3,2)")
  private val one = lit(1).cast("decimal(3,2)")
  private def money(c: org.apache.spark.sql.Column) = round(c.cast("double"), 2)
  private def avg6(sumDec: org.apache.spark.sql.Column, cnt: org.apache.spark.sql.Column) =
    round(sumDec.cast("double") / cnt, 6)

  // ---- shared oracle SQL snippets (DuckDB side) ----
  private val DEC_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
  private val DEC_EXT = "CAST(l_extendedprice AS DECIMAL(18,2))"
  private val DEC_TOT = "CAST(o_totalprice AS DECIMAL(18,2))"
  private val ONE_MINUS_DISC = "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
  private val ONE_PLUS_TAX = "(CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"
  private val REVENUE = s"round(CAST(sum($DEC_EXT * $ONE_MINUS_DISC) AS DOUBLE), 2)"

  val q01 = Q(
    "q01_scan_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
      |  AND l_quantity > 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1999-01-01").cast("timestamp")
        && col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q02 = Q(
    "q02_tpch_q1",
    s"""SELECT l_returnflag, l_linestatus,
       | round(CAST(sum($DEC_QTY) AS DOUBLE), 2) AS sum_qty,
       | round(CAST(sum($DEC_EXT) AS DOUBLE), 2) AS sum_base_price,
       | round(CAST(sum($DEC_EXT * $ONE_MINUS_DISC) AS DOUBLE), 2) AS sum_disc_price,
       | round(CAST(sum($DEC_EXT * $ONE_MINUS_DISC * $ONE_PLUS_TAX) AS DOUBLE), 2) AS sum_charge,
       | round(CAST(sum($DEC_QTY) AS DOUBLE) / count(*), 6) AS avg_qty,
       | round(CAST(sum($DEC_EXT) AS DOUBLE) / count(*), 6) AS avg_price,
       | round(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
       | count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(dec(col("l_extendedprice")) * (one - frac(col("l_discount"))))).as("sum_disc_price"),
        money(sum(dec(col("l_extendedprice")) * (one - frac(col("l_discount"))) * (one + frac(col("l_tax"))))).as("sum_charge"),
        avg6(sum(dec(col("l_quantity"))), count(lit(1))).as("avg_qty"),
        avg6(sum(dec(col("l_extendedprice"))), count(lit(1))).as("avg_price"),
        avg6(sum(frac(col("l_discount"))), count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q03 = Q(
    "q03_tpch_q3",
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $REVENUE AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1999-01-01'
       |  AND l_shipdate > TIMESTAMP '1999-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(money(sum(dec(col("l_extendedprice")) * (one - frac(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q04 = Q(
    "q04_semi_join",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_discount") > 0.05),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q05 = Q(
    "q05_tpch_q5",
    s"""SELECT n_name, $REVENUE AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    // Star join: facts shuffle on their keys, dims broadcast (§2.7).
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(money(sum(dec(col("l_extendedprice")) * (one - frac(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q06 = Q(
    "q06_tpch_q6",
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE), 2) AS revenue,
      | count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(money(sum(dec(col("l_extendedprice")) * frac(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q07 = Q(
    "q07_anti_join",
    """SELECT c_mktsegment, count(*) AS n_cust,
      | round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_bal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        money(sum(dec(col("c_acctbal")))).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  val q08 = Q(
    "q08_outer_join",
    """SELECT c_custkey, count(o_orderkey) AS n_big,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS big_total
      |FROM customer
      |LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 400000
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_big"),
        money(sum(dec(col("o_totalprice")))).as("big_total"))
      .orderBy("c_custkey")
  }

  val q09 = Q(
    "q09_full_outer_join",
    """SELECT coalesce(s.s_nationkey, c.c_nationkey) AS nationkey,
      | coalesce(n_sup, CAST(0 AS BIGINT)) AS n_sup,
      | coalesce(n_cus, CAST(0 AS BIGINT)) AS n_cus
      |FROM (SELECT s_nationkey, count(*) AS n_sup FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey) s
      |FULL OUTER JOIN (SELECT c_nationkey, count(*) AS n_cus FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey) c
      |  ON s.s_nationkey = c.c_nationkey
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_sup"))
    val cus = Tables.customer(s, d).filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cus"))
    sup.join(cus, col("s_nationkey") === col("c_nationkey"), "full_outer")
      .select(
        coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        coalesce(col("n_sup"), lit(0L)).as("n_sup"),
        coalesce(col("n_cus"), lit(0L)).as("n_cus"))
      .orderBy("nationkey")
  }

  val q10 = Q(
    "q10_cross_join",
    """SELECT r_name, n_name
      |FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.region(s, d).select("r_name")
      .crossJoin(Tables.nation(s, d).select("n_name"))
      .orderBy("r_name", "n_name")
  }

  val q11 = Q(
    "q11_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INTEGER) AS ship_year
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus, ship_year""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).as("ship_year"))
      .distinct()
      .orderBy("l_returnflag", "l_linestatus", "ship_year")
  }

  val q12 = Q(
    "q12_topn",
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q13 = Q(
    "q13_union_all",
    """SELECT c_custkey AS ent_key, 'customer' AS src FROM customer WHERE c_acctbal > 9500
      |UNION ALL
      |SELECT s_suppkey AS ent_key, 'supplier' AS src FROM supplier WHERE s_acctbal > 9500
      |ORDER BY src, ent_key""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_acctbal") > 9500)
      .select(col("c_custkey").as("ent_key"), lit("customer").as("src"))
      .unionAll(Tables.supplier(s, d).filter(col("s_acctbal") > 9500)
        .select(col("s_suppkey").as("ent_key"), lit("supplier").as("src")))
      .orderBy("src", "ent_key")
  }

  val q14 = Q(
    "q14_union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
      |UNION
      |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_acctbal") > 9900)
      .select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")
  }

  val q15 = Q(
    "q15_intersect",
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
      .intersect(Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  val q16 = Q(
    "q16_except",
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
      .except(Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("custkey")))
      .orderBy("custkey")
  }

  val q17 = Q(
    "q17_scalar_subquery",
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_small,
      | count(*) AS n
      |FROM lineitem
      |WHERE l_quantity < 0.5 * (
      |  SELECT round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
      |  FROM lineitem)""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val avgQty = li.agg(avg6(sum(dec(col("l_quantity"))), count(lit(1))).as("aq"))
    li.crossJoin(broadcast(avgQty))
      .filter(col("l_quantity") < col("aq") * 0.5)
      .agg(money(sum(dec(col("l_extendedprice")))).as("total_small"),
        count(lit(1)).as("n"))
  }

  val q18 = Q(
    "q18_in_subquery",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 180)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sq"))
      .filter(col("sq") > 180)
      .select("l_orderkey")
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val q19 = Q(
    "q19_correlated_subquery",
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS small_rev,
      | count(*) AS n
      |FROM lineitem l1
      |WHERE l_quantity < 0.5 * (
      |  SELECT round(CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
      |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg6(sum(dec(col("l_quantity"))), count(lit(1))).as("paq"))
    li.join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("paq") * 0.5)
      .agg(money(sum(dec(col("l_extendedprice")))).as("small_rev"),
        count(lit(1)).as("n"))
  }

  val q20 = Q(
    "q20_cte",
    """WITH co AS (
      |  SELECT o_custkey, count(*) AS n,
      |   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
      |  FROM orders GROUP BY o_custkey)
      |SELECT 'hi' AS bucket, count(*) AS n_cust, CAST(sum(n) AS BIGINT) AS n_orders,
      | round(CAST(sum(tot) AS DOUBLE), 2) AS spend
      |FROM co WHERE n >= 15
      |UNION ALL
      |SELECT 'lo' AS bucket, count(*) AS n_cust, CAST(sum(n) AS BIGINT) AS n_orders,
      | round(CAST(sum(tot) AS DOUBLE), 2) AS spend
      |FROM co WHERE n < 15
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    val co = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("tot"))
    def side(tag: String, cond: org.apache.spark.sql.Column) =
      co.filter(cond).agg(count(lit(1)).as("n_cust"),
        sum(col("n")).as("n_orders"), money(sum(col("tot"))).as("spend"))
        .select(lit(tag).as("bucket"), col("n_cust"), col("n_orders"), col("spend"))
    side("hi", col("n") >= 15).unionAll(side("lo", col("n") < 15))
      .orderBy("bucket")
  }

  val q21 = Q(
    "q21_values",
    """SELECT o_orderpriority, weight, count(*) AS n_orders,
      | CAST(weight * count(*) AS BIGINT) AS weighted
      |FROM orders
      |JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
      |             ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) AS w(o_orderpriority, weight)
      |  USING (o_orderpriority)
      |GROUP BY o_orderpriority, weight
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    import s.implicits._
    val weights = Seq(("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3),
      ("4-NOT SPECIFIED", 2), ("5-LOW", 1)).toDF("o_orderpriority", "weight")
    Tables.orders(s, d).join(broadcast(weights), "o_orderpriority")
      .groupBy(col("o_orderpriority"), col("weight"))
      .agg(count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"), col("weight"), col("n_orders"),
        (col("weight") * col("n_orders")).cast("long").as("weighted"))
      .orderBy("o_orderpriority")
  }

  // Identical SQL text runs in Spark SQL and DuckDB (GROUPING SETS).
  private val groupingSetsSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS n,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  val q22 = Q("q22_grouping_sets", groupingSetsSql) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(groupingSetsSql)
  }

  val q23 = Q(
    "q23_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | count(*) AS n,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), money(sum(dec(col("l_extendedprice")))).as("sum_price"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"), col("sum_price"))
      .orderBy("rf", "ls")
  }

  val q24 = Q(
    "q24_cube",
    """SELECT coalesce(y, -1) AS yr, coalesce(o_orderstatus, 'ALL') AS status,
      | count(*) AS n,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_total
      |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_orderstatus, o_totalprice FROM orders)
      |GROUP BY CUBE (y, o_orderstatus)
      |ORDER BY yr, status""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(year(col("o_orderdate")).as("y"), col("o_orderstatus"), col("o_totalprice"))
      .cube(col("y"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), money(sum(dec(col("o_totalprice")))).as("sum_total"))
      .select(coalesce(col("y"), lit(-1)).as("yr"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"), col("n"), col("sum_total"))
      .orderBy("yr", "status")
  }

  val q25 = Q(
    "q25_having",
    """SELECT o_custkey, count(*) AS n,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS spend
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 15
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), money(sum(dec(col("o_totalprice")))).as("spend"))
      .filter(col("n") >= 15)
      .orderBy("o_custkey")
  }

  val q26 = Q(
    "q26_unnest",
    """SELECT doc_id,
      | unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
      | unnest(string_split(text, ' ')) AS word
      |FROM documents WHERE doc_id < 20
      |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("word"))
      .orderBy("doc_id", "pos")
  }

  val q27 = Q(
    "q27_tablesample",
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '10'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    // Reproducible TABLESAMPLE: hash-bucket filter (Presto's TABLESAMPLE
    // BERNOULLI is nondeterministic; a deterministic bucket keeps the
    // oracle meaningful and the sample stable across retries at scale).
    Tables.lineitem(s, d)
      .filter(substring(md5(concat(col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string"))), 1, 2) < "10")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q28 = Q(
    "q28_window_rank",
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      | CAST(rank() OVER w AS INTEGER) AS rnk,
      | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
      | CAST(row_number() OVER w AS INTEGER) AS rn,
      | CAST(ntile(4) OVER w AS INTEGER) AS nt,
      | round(percent_rank() OVER w, 6) AS pr,
      | round(cume_dist() OVER w, 6) AS cd
      |FROM lineitem
      |WHERE l_quantity >= 49
      |WINDOW w AS (PARTITION BY l_returnflag
      |             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
      |QUALIFY row_number() OVER w <= 100
      |ORDER BY l_returnflag, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("nt"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .filter(col("rn") <= 100)
      .orderBy("l_returnflag", "rn")
  }

  val q29 = Q(
    "q29_window_nav",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      | lag(o_totalprice) OVER w AS prev_price,
      | lead(o_totalprice) OVER w AS next_price,
      | first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ok,
      | last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ok,
      | nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_ok
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderkey")).over(wRun).as("first_ok"),
        last(col("o_orderkey")).over(wRun).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(wRun).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q30 = Q(
    "q30_window_frame",
    """SELECT o_custkey, o_orderkey,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_total,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |   / count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-3, Window.currentRow)
    Tables.orders(s, d).filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        money(sum(dec(col("o_totalprice"))).over(wRun)).as("running_total"),
        round(sum(dec(col("o_totalprice"))).over(wMov).cast("double")
          / count(lit(1)).over(wMov), 6).as("moving_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q31 = Q(
    "q31_conditional_agg",
    """SELECT l_returnflag,
      | round(CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_f,
      | round(CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS qty_o,
      | count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_highdisc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val zero = lit(0).cast("decimal(18,2)")
    Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        money(sum(when(col("l_linestatus") === "F", dec(col("l_quantity"))).otherwise(zero))).as("qty_f"),
        money(sum(when(col("l_linestatus") === "O", dec(col("l_quantity"))).otherwise(zero))).as("qty_o"),
        count(when(col("l_discount") > 0.05, 1)).as("n_highdisc"))
      .orderBy("l_returnflag")
  }

  /** Multiset set ops (Presto INTERSECT ALL / EXCEPT ALL): bag
    * semantics, occurrence counts = min / difference — distinct from
    * q15/q16's set semantics. Output aggregated to (value, multiplicity)
    * for a deterministic order.
    */
  val q58 = Q(
    "q58_set_ops_all",
    """WITH r AS (SELECT CAST(l_quantity AS INTEGER) AS qty FROM lineitem WHERE l_returnflag = 'R'),
      |a AS (SELECT CAST(l_quantity AS INTEGER) AS qty FROM lineitem WHERE l_returnflag = 'A'),
      |i AS (SELECT qty FROM r INTERSECT ALL SELECT qty FROM a),
      |e AS (SELECT qty FROM r EXCEPT ALL SELECT qty FROM a)
      |SELECT 'intersect_all' AS op, qty, count(*) AS n FROM i GROUP BY qty
      |UNION ALL
      |SELECT 'except_all' AS op, qty, count(*) AS n FROM e GROUP BY qty
      |ORDER BY op, qty""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def bag(flag: String) = li.filter(col("l_returnflag") === flag)
      .select(col("l_quantity").cast("int").as("qty"))
    val i = bag("R").intersectAll(bag("A"))
      .groupBy(col("qty")).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("qty"), col("n"))
    val e = bag("R").exceptAll(bag("A"))
      .groupBy(col("qty")).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("qty"), col("n"))
    i.unionAll(e).orderBy("op", "qty")
  }

  /** RANGE-framed window (value/time range, not row offsets): per
    * customer, order count and spend inside a trailing 90-day window of
    * each order. Spark rangeBetween needs a numeric sort key → epoch
    * seconds; DuckDB frames over the timestamp directly.
    */
  val q59 = Q(
    "q59_window_range_frame",
    """SELECT o_custkey, o_orderkey,
      | count(*) OVER w AS n_90d,
      | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE), 2) AS spend_90d
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-90L * 86400, Window.currentRow)
    Tables.orders(s, d).filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        count(lit(1)).over(w).as("n_90d"),
        money(sum(dec(col("o_totalprice"))).over(w)).as("spend_90d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Correlated LATERAL subquery with per-row LIMIT (Presto
    * LATERAL derived tables): top-2 nations by customer count within
    * each region, decorrelated by Catalyst into a ranked join.
    */
  val q83 = Q(
    "q83_lateral_topn",
    """SELECT r.r_name, t.n_name, t.cnt
      |FROM region r,
      |LATERAL (
      |  SELECT n.n_name, count(*) AS cnt
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY cnt DESC, n.n_name
      |  LIMIT 2
      |) t
      |ORDER BY r.r_name, t.cnt DESC, t.n_name""".stripMargin) { (s, d) =>
    Tables.region(s, d).createOrReplaceTempView("graft_q83_region")
    Tables.nation(s, d).createOrReplaceTempView("graft_q83_nation")
    Tables.customer(s, d).createOrReplaceTempView("graft_q83_customer")
    s.sql("""
      SELECT r.r_name, t.n_name, t.cnt
      FROM graft_q83_region r,
      LATERAL (
        SELECT n.n_name, count(*) AS cnt
        FROM graft_q83_nation n
        JOIN graft_q83_customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY cnt DESC, n.n_name
        LIMIT 2
      ) t
      ORDER BY r.r_name, t.cnt DESC, t.n_name""")
  }

  // Z-order (Morton) clustering index — the multi-dimensional
  // data-skipping layout (graft.operators.ZOrder; Delta/Iceberg
  // OPTIMIZE ZORDER analog). The z-value interleaves quantized
  // (quantity, partkey) bits with pure %-arithmetic shared verbatim by
  // both engines; the query reports per-z-cell occupancy + per-cell
  // (x, y) bounding boxes — the statistics a reader prunes with.
  // ZOrderSpec writes the clustered layout and shows its per-file
  // boxes are far tighter than a one-dimensional sort's.
  val q139 = {
    val zSql = graft.operators.ZOrder.zvalSql("x", "y", bits = 10)
    Q(
      "q139_zorder_cells",
      s"""WITH p AS (SELECT
         |  CAST('0x' || substr(md5('zx|' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS x,
         |  CAST('0x' || substr(md5('zy|' || CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS y
         |           FROM lineitem),
         |z AS (SELECT x, y, $zSql AS zval FROM p)
         |SELECT zval - (zval % 16384) AS cell, CAST(count(*) AS BIGINT) AS n,
         | CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
         | CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
         |FROM z GROUP BY 1
         |ORDER BY cell""".stripMargin) { (s, d) =>
      def k(salt: String) =
        conv(substring(md5(concat(lit(s"$salt|"), col("l_orderkey").cast("string"),
          lit("|"), col("l_linenumber").cast("string"))), 1, 8), 16, 10).cast("long") % 1024
      Tables.lineitem(s, d)
        .select(k("zx").as("x"), k("zy").as("y"))
        .withColumn("zval", graft.operators.ZOrder.zval("x", "y", bits = 10))
        .groupBy((col("zval") - (col("zval") % 16384)).as("cell"))
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .orderBy("cell")
    }
  }

  // ---- q146: bloom-pruned semi join (graft.operators.Bloom) --------------
  // The runtime-filter pattern (reference DynamicFilterSourceOperator.java:1):
  // the dim key set (high-value orders) is compiled into a broadcast Bloom
  // filter that drops fact rows MAP-SIDE before the join shuffle; the exact
  // semi join then removes the false positives, so the result is exactly
  // `fact ⋉ dim` — which is what the oracle states. BloomSpec pins the
  // sketch behavior (no false negatives, FPP bound, merge invariance) and
  // the plan shape (graft_bloom_contains filter present, pruning measured).
  val q146 = Q(
    "q146_bloom_semi_join",
    """SELECT l_returnflag,
      | CAST(count(*) AS BIGINT) AS n,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val dim = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))
    graft.operators.Bloom.prunedSemiJoin(
        Tables.lineitem(s, d), dim, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        Q.money(sum(Q.dec(col("l_extendedprice")))).as("revenue"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q30, q31, q58, q59, q83, q139, q146)
}
