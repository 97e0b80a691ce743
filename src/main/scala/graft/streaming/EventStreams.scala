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

/** State/output rows for the streaming gap-fill spine emitter. */
case class GapFillState(lastClosedHourMs: Long, runningN: Long,
                        pending: Map[Long, Long])
case class GapFillRow(event_type: String, hr: Timestamp, n: Long,
                      running_n: Long, was_gap: Boolean)

/** State/output rows for the streaming funnel stage tracker. */
case class FunnelState(firstViewMs: Long, clicks: List[Long],
                       purchases: List[Long], lastSeenMs: Long)
case class FunnelRow(user_id: Long, clicked: Boolean, purchased: Boolean,
                     sec_to_click: Option[Long], sec_to_purchase: Option[Long])

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

  /** Streaming gap-fill (the q123 face on unbounded input): per
    * event_type, emit one row per HOUR — including empty hours, zero-
    * filled, with the running total — as soon as the watermark closes
    * the hour. Stateful spine emission via flatMapGroupsWithState:
    * state per type is the set of not-yet-closed hour counts plus the
    * running total, O(watermark horizon / 1 hour) regardless of event
    * volume — each closed hour is emitted exactly once (Append mode),
    * so a downstream sink materializes the same dense spine the batch
    * query builds with sequence()+explode.
    *
    * Boundary semantics vs the batch form: each type's spine starts at
    * the type's own first event hour and pauses while the type is
    * quiet past its last pending hour (the batch form uses the GLOBAL
    * min/max bounds — on an unbounded stream there is no max, and
    * emitting zeros forever for a dead type would be unbounded output).
    * StreamingSpec aligns the two by planting events for every type in
    * the boundary hours.
    */
  def gapFillStream(events: DataFrame,
                    watermarkDelay: String = "10 minutes"): Dataset[GapFillRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val HourMs = 3600000L
    events.select(col("event_type"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GapFillState, GapFillRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (etype: String, rows: Iterator[(String, Timestamp)],
         state: GroupState[GapFillState]) =>
          var st = state.getOption.getOrElse(
            GapFillState(Long.MinValue, 0L, Map.empty))
          var pending = st.pending
          rows.foreach { r =>
            val hourMs = Math.floorDiv(r._2.getTime, HourMs) * HourMs
            // an hour already emitted never re-opens (admitted-late events
            // inside the watermark land in pending; beyond-watermark lates
            // were dropped upstream — this guard is the Append invariant)
            if (hourMs > st.lastClosedHourMs)
              pending = pending.updated(hourMs, pending.getOrElse(hourMs, 0L) + 1L)
          }
          val wm = state.getCurrentWatermarkMs()
          val out = scala.collection.mutable.ArrayBuffer[GapFillRow]()
          val closable = pending.keys.filter(h => h + HourMs <= wm)
          if (closable.nonEmpty) {
            // close every hour up to the last data-bearing closed hour,
            // zero-filling the gaps in between
            val firstHour =
              if (st.lastClosedHourMs == Long.MinValue) pending.keys.min
              else st.lastClosedHourMs + HourMs
            val upTo = closable.max
            var running = st.runningN
            var h = firstHour
            while (h <= upTo) {
              val n = pending.getOrElse(h, 0L)
              running += n
              out += GapFillRow(etype, new Timestamp(h), n, running, n == 0L)
              h += HourMs
            }
            st = GapFillState(upTo, running, pending.filter(_._1 > upTo))
          } else st = st.copy(pending = pending)
          state.update(st)
          if (st.pending.nonEmpty)
            // wake up when the earliest open hour becomes closable even
            // if this type sees no further events
            state.setTimeoutTimestamp(math.max(st.pending.keys.min + HourMs, wm + 1L))
          out.iterator
      }
  }

  /** Streaming conversion funnel (the q124 face on unbounded input):
    * per-user stage tracking via flatMapGroupsWithState. Stage
    * semantics match the batch query — t_view = earliest view,
    * t_click = earliest click AFTER t_view, t_purchase = earliest
    * purchase AFTER t_click — evaluated over the events inside a
    * conversion `horizon` from first view (the product-analytics
    * conversion window; an unbounded funnel cannot finalize on an
    * unbounded stream). A user's row emits exactly once, when the
    * watermark passes first_view + horizon; with horizon ≥ the data
    * span the result equals the unwindowed batch funnel
    * (StreamingSpec asserts exactly that).
    *
    * Re-emission contract: finalization drops the user's state, so a
    * user who RETURNS — a new view admitted after their window
    * finalized — starts a NEW conversion window and emits another row.
    * Output is one row per (user, conversion window), not one per
    * user: the product-analytics reading of an unbounded stream
    * (remembering every finalized user forever would be unbounded
    * state). With horizon ≥ the data span no second window can open,
    * which is where the batch-parity claim lives.
    *
    * State per user: first view (compacted to the min — it only ever
    * decreases, which can only widen the `> t_view` click set), plus
    * the click/purchase timestamps inside the horizon (kept raw: a
    * late earlier view can re-qualify an earlier click, so stage picks
    * are resolved once, at emit). Viewless users are GC'd a horizon
    * after last sight. State is O(events per user per horizon) —
    * bounded by the horizon, not the stream.
    */
  def funnelStream(events: DataFrame, horizonMinutes: Int = 24 * 60,
                   watermarkDelay: String = "10 minutes"): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val horizonMs = horizonMinutes * 60000L
    events.select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(
            FunnelState(Long.MaxValue, Nil, Nil, Long.MinValue))
          rows.foreach { case (_, ts, tpe) =>
            val t = ts.getTime
            tpe match {
              case "view" => st = st.copy(firstViewMs = math.min(st.firstViewMs, t))
              case "click" => st = st.copy(clicks = t :: st.clicks)
              case "purchase" => st = st.copy(purchases = t :: st.purchases)
              case _ => ()
            }
            st = st.copy(lastSeenMs = math.max(st.lastSeenMs, t))
          }
          val wm = state.getCurrentWatermarkMs()
          // STRICT >: the qualification window is inclusive of
          // first_view + horizon, and an event timestamped exactly there
          // is not yet late at wm == hEnd (drop predicate is ts < wm) —
          // finalizing at equality could lose it (gapFillStream's
          // h + HourMs <= wm is the same watermark-safe form)
          if (st.firstViewMs != Long.MaxValue && wm > st.firstViewMs + horizonMs) {
            // finalize: resolve the stage picks from the buffered
            // candidates, emit once, drop the state
            val tView = st.firstViewMs
            val hEnd = tView + horizonMs
            val tClick = st.clicks.filter(t => t > tView && t <= hEnd)
              .sorted.headOption
            val tPurchase = tClick.flatMap(tc =>
              st.purchases.filter(t => t > tc && t <= hEnd).sorted.headOption)
            state.remove()
            Iterator.single(FunnelRow(user, tClick.isDefined, tPurchase.isDefined,
              tClick.map(t => Math.floorDiv(t, 1000L) - Math.floorDiv(tView, 1000L)),
              for (tc <- tClick; tp <- tPurchase)
                yield Math.floorDiv(tp, 1000L) - Math.floorDiv(tc, 1000L)))
          } else if (st.firstViewMs == Long.MaxValue
              && st.lastSeenMs != Long.MinValue
              && wm > st.lastSeenMs + horizonMs) {
            // viewless user: never part of the funnel output — GC
            state.remove()
            Iterator.empty
          } else {
            state.update(st)
            val target =
              if (st.firstViewMs != Long.MaxValue) st.firstViewMs + horizonMs
              else st.lastSeenMs + horizonMs
            state.setTimeoutTimestamp(math.max(target, wm + 1L))
            Iterator.empty
          }
      }
  }
}
