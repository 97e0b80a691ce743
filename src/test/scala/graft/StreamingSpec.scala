package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, SessionRow}

/** Structured Streaming specs (§2.5): the batch transforms of
  * EventStreams run unchanged on a stream; watermarks bound state.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  private def sampleEvents: Seq[Ev] = {
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    (0 until 100).map { i =>
      Ev(i.toLong, new Timestamp(t0 + i * 90L * 1000), i % 7,
        if (i % 2 == 0) "click" else "view", i.toDouble / 4)
    }
  }

  test("tumbling agg over MemoryStream + watermark equals the batch result") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(sampleEvents)
    val query = EventStreams.tumblingAgg(stream.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy("ws", "event_type").collect().toSeq
      val batch = EventStreams.tumblingAgg(sampleEvents.toDF())
        .orderBy("ws", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("stream-static enrichment join: streaming events pick up broadcast dim attributes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // dim side is a static table broadcast to every micro-batch — the
    // standard enrichment shape (no stream-stream state, no watermark
    // requirement on the static side)
    val dim = Tables.nation(spark, sfDir)
      .select((col("n_nationkey") % 7).cast("long").as("user_id"), col("n_name"))
      .groupBy("user_id").agg(min("n_name").as("n_name"))
    val stream = MemoryStream[Ev]
    stream.addData(sampleEvents.take(50))
    val enriched = stream.toDF().join(broadcast(dim), Seq("user_id"), "left")
    val query = enriched.writeStream.format("memory")
      .queryName("enrich_test").outputMode("append").start()
    try {
      stream.addData(sampleEvents.drop(50))
      query.processAllAvailable()
      val streamed = spark.table("enrich_test")
        .select("event_id", "user_id", "n_name")
        .orderBy("event_id").collect().toSeq
      val batch = sampleEvents.toDF().join(broadcast(dim), Seq("user_id"), "left")
        .select("event_id", "user_id", "n_name")
        .orderBy("event_id").collect().toSeq
      assert(streamed === batch && streamed.size === 100)
      assert(streamed.forall(r => !r.isNullAt(2)))
    } finally query.stop()
  }

  test("streaming exact dedup drops cross-batch duplicates within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(id: Long, offsetMin: Long) =
      Ev(id, new Timestamp(t0 + offsetMin * 60000), 1, "click", 1.0)
    // event_id is the dedup key; id 1 repeats in the same batch and again
    // in a later batch inside the watermark window
    stream.addData(Seq(ev(1, 0), ev(1, 1), ev(2, 2)))
    val query = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      stream.addData(Seq(ev(1, 5), ev(3, 6)))
      query.processAllAvailable()
      val ids = spark.table("dedup_test")
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("streaming debounce (first event per key+bucket) matches the batch thinning") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Ev]
    def thin(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("bucket", window(col("ts"), "5 minutes").getField("start"))
      .dropDuplicates("user_id", "event_type", "bucket")
    // dense chatter: same (user, type) repeats every 90 s, well inside
    // the 5-minute bucket, so most events are suppressed. Events arrive
    // in ts order (the debounce contract at ingestion), split across
    // two micro-batches.
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val dense = (0 until 100).map { i =>
      Ev(i.toLong, new Timestamp(t0 + i * 30L * 1000), i % 3, "click", 1.0)
    }
    val (b1, b2) = dense.splitAt(60)
    stream.addData(b1)
    val query = thin(stream.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("debounce_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      stream.addData(b2)
      query.processAllAvailable()
      val streamed = spark.table("debounce_test")
        .select("event_id").as[Long].collect().toSet
      val batch = thin(dense.toDF())
        .select("event_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(batch.size < dense.size / 2) // most chatter was suppressed
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(id: Long, offsetMin: Long, user: Long, typ: String) =
      Ev(id, new Timestamp(t0 + offsetMin * 60000), user, typ, 1.0)
    val cs = Seq(ev(1, 0, 1, "click"), ev(2, 10, 2, "click"), ev(3, 0, 3, "click"))
    val ps = Seq(
      ev(101, 30, 1, "purchase"),  // in range for click 1
      ev(102, 65, 1, "purchase"),  // 65 min after click 1 → out of range
      ev(103, 20, 2, "purchase"),  // in range for click 2
      ev(104, 200, 3, "purchase")) // far out of range
    clicks.addData(cs)
    purchases.addData(ps)
    val query = EventStreams.clickToPurchase(
        clicks.toDF(), purchases.toDF(), "1 hour", streaming = true)
      .writeStream.format("memory").queryName("interval_join_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("interval_join_test")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(streamed == Set((1L, 101L), (2L, 103L)))
      val batch = EventStreams.clickToPurchase(cs.toDF(), ps.toDF(), "1 hour")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(batch == streamed)
    } finally query.stop()
  }

  test("session_window stream closes sessions at the gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    // user 1: two bursts 2 hours apart → 2 sessions; user 2: one burst
    val evs = Seq(
      Ev(1, new Timestamp(t0), 1, "click", 1.0),
      Ev(2, new Timestamp(t0 + 60 * 1000), 1, "click", 1.0),
      Ev(3, new Timestamp(t0 + 2 * 3600 * 1000), 1, "click", 1.0),
      Ev(4, new Timestamp(t0 + 30 * 1000), 2, "view", 1.0))
    val stream = MemoryStream[Ev]
    stream.addData(evs)
    val query = EventStreams.sessionWindowStream(stream.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val out = spark.table("session_test").collect()
      assert(out.count(_.getAs[Long]("user_id") == 1L) == 2, out.mkString(","))
      assert(out.count(_.getAs[Long]("user_id") == 2L) == 1, out.mkString(","))
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionizer: gap closes in-batch, timeout flushes the open session") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val stream = MemoryStream[Ev]
    val query = EventStreams.statefulSessionize(
        stream.toDF(), gapMinutes = 30, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("stateful_session")
      .outputMode("append").start()
    try {
      // batch 1: user 1 burst of 3 + a post-gap event → first session
      // closes within the batch
      stream.addData(Seq(
        Ev(1, new Timestamp(t0), 1, "click", 1.0),
        Ev(2, new Timestamp(t0 + 60 * 1000), 1, "click", 1.0),
        Ev(3, new Timestamp(t0 + 120 * 1000), 1, "click", 1.0),
        Ev(4, new Timestamp(t0 + 2 * 3600 * 1000), 1, "click", 1.0)))
      query.processAllAvailable()
      val afterB1 = spark.table("stateful_session").as[SessionRow].collect()
      assert(afterB1.length == 1 && afterB1.head.n_events == 3)
      // batch 2 advances the max event time; batch 3 triggers the
      // timeout once the watermark (maxTs - delay) passes session end+gap
      stream.addData(Seq(Ev(5, new Timestamp(t0 + 4 * 3600 * 1000), 2, "view", 1.0)))
      query.processAllAvailable()
      stream.addData(Seq(Ev(6, new Timestamp(t0 + 5 * 3600 * 1000), 2, "view", 1.0)))
      query.processAllAvailable()
      val out = spark.table("stateful_session").as[SessionRow].collect()
      val u1 = out.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(u1.length == 2, out.mkString(","))
      assert(u1(0).n_events == 3 && u1(1).n_events == 1)
    } finally query.stop()
  }

  test("streaming gap-fill emits the dense zero-filled hourly spine == batch (q123 face)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(id: Long, minute: Long, u: Long, tpe: String) =
      Ev(id, new Timestamp(t0 + minute * 60000L), u, tpe, 1.0)
    // both types have events in the global first (10:00) and last
    // (13:00) hours, so the per-type streaming spine coincides with the
    // batch global-bounds spine; 'click' skips hours 11 AND 12,
    // 'view' skips hour 12 only — the zero-fill under test
    val real = Seq(
      ev(1, 5, 1, "click"), ev(2, 10, 2, "view"), ev(3, 20, 1, "view"),
      ev(4, 70, 3, "view"),                       // view hour 11
      ev(5, 185, 1, "click"), ev(6, 190, 2, "click"), ev(7, 200, 3, "view"))
    val stream = MemoryStream[Ev]
    // deliver out of (event-time) order across two micro-batches: the
    // hour-11 view arrives AFTER hour-13 data, inside the watermark
    stream.addData(real.filter(_.event_id != 4))
    // 3 h delay: the hour-11 view arrives a micro-batch after hour-13
    // data, i.e. ~2 h event-time late — it must be INSIDE the watermark
    val query = EventStreams.gapFillStream(stream.toDF(), watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("gapfill_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      stream.addData(Seq(real.find(_.event_id == 4).get))
      query.processAllAvailable()
      // sentinel advances the watermark past the end of hour 13 so every
      // real hour closes; its own hour stays open and must not emit
      stream.addData(Seq(ev(99, 7 * 60 + 30, 9, "click")))
      query.processAllAvailable()
      val streamed = spark.table("gapfill_test")
        .select("event_type", "hr", "n", "running_n", "was_gap")
        .orderBy("event_type", "hr").collect().toSeq
      // the batch q123 shape over the same (real) events
      val evDf = real.toDF()
      val bounds = evDf.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val hours = bounds.select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hr"))
      val types = evDf.select(col("event_type")).distinct()
      val spine = hours.crossJoin(broadcast(types))
      val counts = evDf.groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("cn"))
      val batch = spine.join(counts, Seq("hr", "event_type"), "left")
        .select(col("event_type"), col("hr"),
          coalesce(col("cn"), lit(0L)).as("n"), col("cn").isNull.as("was_gap"))
        .withColumn("running_n", sum(col("n")).over(
          Window.partitionBy(col("event_type")).orderBy(col("hr"))))
        .select("event_type", "hr", "n", "running_n", "was_gap")
        .orderBy("event_type", "hr").collect().toSeq
      assert(streamed == batch, s"stream:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
      assert(streamed.count(_.getBoolean(4)) == 3, "three zero-filled gap hours expected")
    } finally query.stop()
  }

  test("streaming funnel finalizes per-user stages at the horizon == batch (q124 face)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(id: Long, minute: Long, u: Long, tpe: String) =
      Ev(id, new Timestamp(t0 + minute * 60000L), u, tpe, 1.0)
    // user 1: clean view -> click -> purchase
    // user 2: pre-view click (must not count), late-arriving view,
    //         pre-click purchase (must not count), then real purchase
    // user 3: view only;  user 4: viewless (no funnel row, GC'd)
    val real = Seq(
      ev(1, 0, 1, "view"), ev(2, 5, 1, "click"), ev(3, 20, 1, "purchase"),
      ev(4, 0, 2, "click"), ev(5, 10, 2, "view"), ev(6, 15, 2, "click"),
      ev(7, 5, 2, "purchase"), ev(8, 30, 2, "purchase"),
      ev(9, 8, 3, "view"),
      ev(10, 3, 4, "click"), ev(11, 12, 4, "purchase"))
    val stream = MemoryStream[Ev]
    // user 2's view arrives in a LATER micro-batch than her clicks —
    // the late-earlier-view re-qualification path
    stream.addData(real.filter(_.event_id != 5))
    val query = EventStreams.funnelStream(stream.toDF(),
        horizonMinutes = 120, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("funnel_test")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      stream.addData(Seq(real.find(_.event_id == 5).get))
      query.processAllAvailable()
      // sentinel pushes the watermark past every first_view + horizon
      stream.addData(Seq(ev(99, 8 * 60, 9, "noise")))
      query.processAllAvailable()
      val streamed = spark.table("funnel_test")
        .select("user_id", "clicked", "purchased", "sec_to_click", "sec_to_purchase")
        .orderBy("user_id").collect().toSeq
      // the batch q124 shape over the same (real) events
      val evDf = real.toDF()
      val v = evDf.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = evDf.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val pp = evDf.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      val batch = v.join(c, Seq("user_id"), "left").join(pp, Seq("user_id"), "left")
        .select(col("user_id"),
          col("t_click").isNotNull.as("clicked"),
          col("t_purchase").isNotNull.as("purchased"),
          when(col("t_click").isNotNull,
            unix_timestamp(col("t_click")) - unix_timestamp(col("t_view"))).as("sec_to_click"),
          when(col("t_purchase").isNotNull,
            unix_timestamp(col("t_purchase")) - unix_timestamp(col("t_click"))).as("sec_to_purchase"))
        .orderBy("user_id").collect().toSeq
      assert(streamed == batch, s"stream:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
      assert(streamed.map(_.getLong(0)) == Seq(1L, 2L, 3L), "users 1-3 only (4 is viewless)")
    } finally query.stop()
  }

  test("batch sessionize splits a user at the inactivity gap") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val evs = Seq(
      Ev(1, new Timestamp(t0), 1, "click", 1.0),
      Ev(2, new Timestamp(t0 + 60 * 1000), 1, "click", 1.0),
      Ev(3, new Timestamp(t0 + 2 * 3600 * 1000), 1, "click", 1.0))
    val sessions = EventStreams.sessionize(evs.toDF()).collect()
    assert(sessions.length == 2)
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }
}
