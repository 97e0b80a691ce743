package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input/state/output rows for the custom-state sessionizer (top level:
  * Spark encoders can't handle inner classes).
  */
case class UserEvent(user_id: Long, ts: Timestamp)
case class SessionAcc(startMs: Long, endMs: Long, n: Long)
case class SessionRow(user_id: Long, session_start: Timestamp,
                      session_end: Timestamp, n_events: Long)

/** Event-time analytics over the events table (SURVEY.md §2.5) — the
  * Spark answer to the reference's realtime connector surface
  * (reference: presto-kafka/src/main/java/com/facebook/presto/kafka/
  * KafkaConnector.java:1).
  *
  * Each transform takes a DataFrame and works identically on a batch
  * scan and a streaming source: the batch path is the oracle-checked
  * correctness surface (q53–q55), the streaming path reuses the same
  * functions under a watermark (see StreamingSpec).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. On a stream, pair with
    * withWatermark("ts", ...) — state is bounded by watermark horizon.
    */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("total_value"))
      .select(col("win.start").as("ws"), col("event_type"), col("n"), col("total_value"))

  /** Hopping (sliding) windows: width `width`, advancing every `slide`.
    * Each event lands in width/slide windows — Spark's window() does the
    * replication; state on a stream stays bounded by the watermark.
    */
  def hoppingAgg(events: DataFrame, width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("ws"), col("event_type"), col("n"))

  /** Gap-based sessionization (batch form): a session breaks after
    * `gapMinutes` of user inactivity. Window-function formulation — one
    * shuffle on user_id, no self-join. The streaming twin uses
    * session_window (see [[sessionWindowStream]]).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_sec"))
  }

  /** Streaming sessionization via Spark's native session_window — the
    * state-store-backed equivalent of [[sessionize]] for unbounded input.
    */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"))

  /** Custom-state sessionization via flatMapGroupsWithState — the shape
    * to reach for when session logic outgrows session_window (per-session
    * derived features, conditional splits, capped lengths).
    *
    * State per user is the list of sessions not yet finalized by the
    * watermark. A session only emits once the watermark passes
    * session_end + gap — until then a late-but-admitted event may still
    * extend it (or bridge two of them), so emitting earlier would produce
    * overlapping duplicates in Append mode. A late event that lands
    * before a session's start lowers session_start (min-merge), it never
    * spawns a second overlapping session. State is O(users × sessions
    * inside the watermark horizon) — no per-event retention.
    */
  def statefulSessionize(events: DataFrame, gapMinutes: Int = 30,
                         watermarkDelay: String = "10 minutes"): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionAcc], SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[UserEvent], state: GroupState[List[SessionAcc]]) =>
          def emit(a: SessionAcc) = SessionRow(
            user, new Timestamp(a.startMs), new Timestamp(a.endMs), a.n)
          // fold each event into every session within gap reach (an event
          // can bridge two sessions into one); otherwise open a new one
          var sessions = state.getOption.getOrElse(Nil)
          evs.map(_.ts.getTime).toSeq.sorted.foreach { t =>
            val (near, far) = sessions.partition(a =>
              t >= a.startMs - gapMs && t <= a.endMs + gapMs)
            val merged = near.foldLeft(SessionAcc(t, t, 1)) { (m, a) =>
              SessionAcc(math.min(m.startMs, a.startMs),
                math.max(m.endMs, a.endMs), m.n + a.n)
            }
            sessions = merged :: far
          }
          // finalize everything the watermark has passed; hold the rest
          val wm = state.getCurrentWatermarkMs()
          val (done, pending) = sessions.partition(_.endMs + gapMs <= wm)
          if (pending.isEmpty) state.remove()
          else {
            state.update(pending)
            state.setTimeoutTimestamp(pending.map(_.endMs + gapMs).min)
          }
          done.sortBy(_.startMs).map(emit).iterator
      }
  }

  /** Stream-stream interval join: each click pairs with the same user's
    * purchases landing within (0, maxDelay] after it. Works identically
    * on batch frames (the q88 oracle path) and on two watermarked
    * streams — the time-range predicate is what lets Spark bound the
    * join state to the interval + watermark horizon on both sides
    * (without it, stream-stream state would grow forever).
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
                      maxDelay: String = "1 hour",
                      streaming: Boolean = false): DataFrame = {
    val c0 = clicks.select(col("user_id"), col("ts").as("click_ts"),
      col("event_id").as("click_id"))
    val p0 = purchases.select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
      col("event_id").as("purchase_id"))
    val (c, p) =
      if (streaming) (c0.withWatermark("click_ts", maxDelay),
        p0.withWatermark("purchase_ts", maxDelay))
      else (c0, p0)
    c.join(p,
      col("user_id") === col("p_user")
        && col("purchase_ts") > col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $maxDelay"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }
}
