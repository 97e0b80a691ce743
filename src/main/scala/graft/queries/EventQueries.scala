package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, QueryFamily, Tables}
import graft.streaming.EventStreams

/** §2.5 Event-time analytics (tumbling / session / hopping windows).
  * Batch-equivalent oracles; the same transforms run under Structured
  * Streaming with watermarks in StreamingSpec.
  */
object EventQueries extends QueryFamily {

  val q53 = Q(
    "q53_event_tumbling",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
      | count(*) AS n,
      | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    EventStreams.tumblingAgg(Tables.events(s, d), "1 hour")
      .orderBy("ws", "event_type")
  }

  val q54 = Q(
    "q54_event_sessionize",
    """WITH x AS (
      |  SELECT user_id, event_id, ts,
      |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |y AS (
      |  SELECT user_id, event_id, ts,
      |   CASE WHEN prev_ts IS NULL
      |          OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
      |        THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT user_id, ts,
      |   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM y)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
      | min(ts) AS session_start, max(ts) AS session_end,
      | CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_sec
      |FROM z
      |GROUP BY 1, 2
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    EventStreams.sessionize(Tables.events(s, d), gapMinutes = 30)
      .orderBy("user_id", "session_id")
  }

  val q55 = Q(
    "q55_event_hopping",
    """WITH w AS (
      |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
      |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS ws,
      |         event_type
      |  FROM events)
      |SELECT CAST(ws AS TIMESTAMP) AS ws, event_type, count(*) AS n
      |FROM w
      |GROUP BY 1, 2
      |ORDER BY ws, event_type""".stripMargin) { (s, d) =>
    EventStreams.hoppingAgg(Tables.events(s, d), "1 hour", "30 minutes")
      .orderBy("ws", "event_type")
  }

  /** As-of join: each event picks up the latest order of the same
    * customer known at event time (point-in-time feature attachment, no
    * future leakage). Oracle: DuckDB's native ASOF LEFT JOIN over the
    * same deduped snapshot.
    */
  val q56 = Q(
    "q56_asof_join",
    """WITH snap AS (
      |  SELECT o_custkey, o_orderdate,
      |   max(o_orderkey) AS o_orderkey,
      |   arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.ts,
      | s.o_orderkey, s.o_orderdate, s.o_totalprice
      |FROM events e ASOF LEFT JOIN snap s
      |  ON e.user_id = s.o_custkey AND e.ts >= s.o_orderdate
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    import graft.operators.AsOf
    val snap = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
      .select(col("o_custkey"), col("o_orderdate"),
        col("m.o_orderkey").as("o_orderkey"),
        col("m.o_totalprice").as("o_totalprice"))
    val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
    AsOf.join(ev, col("user_id"), col("ts"),
        snap, col("o_custkey"), col("o_orderdate"))
      .select("event_id", "user_id", "ts",
        "o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy("event_id")
  }

  // Batch face of the stream-stream interval join (EventStreams
  // .clickToPurchase): same function runs on two watermarked streams in
  // StreamingSpec; here the DuckDB oracle checks the time-range join
  // semantics exactly.
  val q88 = Q(
    "q88_interval_join",
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      | c.ts AS click_ts, p.ts AS purchase_ts
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      |ORDER BY click_id, purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    EventStreams.clickToPurchase(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"), "1 hour")
      .orderBy("click_id", "purchase_id")
  }

  val all: Seq[Q] = Seq(q53, q54, q55, q56, q88)
}
