package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.streaming.StreamOps

/** Approximate-sketch error bounds and the incremental (streaming)
  * join/dedup operators. */
class SketchStreamSpec extends SparkSpec {

  private val ss = SparkSpec.spark
  import ss.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("approx_count_distinct lands within 3x rsd of exact") {
    val li = table("lineitem")
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = Sketches.approxDistinct(li, Nil, "l_partkey", rsd = 0.05)
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"exact $exact approx $approx")
  }

  test("datasketches HLL sketches merge across groups to the global estimate") {
    val li = table("lineitem")
    val perGroup = Sketches.hllSketches(li, Seq("l_returnflag"), "l_partkey")
    val merged = perGroup.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("nd"))
      .head().getLong(0)
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"exact $exact merged-estimate $merged")
  }

  test("approx percentiles bracket the exact median") {
    val li = table("lineitem")
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approx = Sketches.approxPercentiles(li, Nil, "l_extendedprice",
      Seq(0.25, 0.5, 0.75)).head().getSeq[Double](0)
    assert(approx.length === 3 && approx(0) <= approx(1) && approx(1) <= approx(2))
    assert(math.abs(approx(1) - exact) / exact < 0.05,
      s"exact-median $exact approx ${approx(1)}")
  }

  test("streamingEwma carries the recursion across micro-batches") {
    val events = MemoryStream[(Long, Timestamp, Double)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = events.toDF.toDF("user_id", "ts", "value")
    val sm = StreamOps.streamingEwma(df, "user_id", "ts", "value", alpha = 0.5)
    val q = sm.writeStream.format("memory").queryName("ewma")
      .outputMode("append").start()
    try {
      events.addData((1L, ts(0), 4.0), (1L, ts(1), 8.0)) // batch 1
      q.processAllAvailable()
      events.addData((1L, ts(2), 2.0), (2L, ts(2), 10.0)) // batch 2
      q.processAllAvailable()
      val got = ss.sql("SELECT key, ts_sec, ewma FROM ewma")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      // alpha=0.5 is a binary power: 4 → .5*8+.5*4=6 → .5*2+.5*6=4 exact
      assert(got.toSeq === Seq(
        (1L, ts(0).getTime / 1000, 4.0),
        (1L, ts(1).getTime / 1000, 6.0),
        (1L, ts(2).getTime / 1000, 4.0), // state crossed the batch boundary
        (2L, ts(2).getTime / 1000, 10.0)))
    } finally q.stop()
  }

  test("windowedUsers: per-slot HLL reach matches exact at small cardinality") {
    val events = MemoryStream[(Long, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val df = events.toDF.toDF("user_id", "ts")
    val reach = StreamOps.windowedUsers(df, "ts", "user_id",
      windowLen = "1 hour", slide = "30 minutes")
    val q = reach.writeStream.format("memory").queryName("reach")
      .outputMode("update").start()
    try {
      // 3 distinct users, one duplicate, all inside 10:00-10:30
      events.addData((1L, ts(5)), (2L, ts(10)), (3L, ts(20)), (1L, ts(25)))
      q.processAllAvailable()
      // each event lands in two hopping slots (10:00 and 09:30 starts);
      // HLL++ is exact in its sparse regime, so tiny sets count exactly
      val rows = ss.sql("SELECT win_start, n_users, n_events FROM reach")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(rows.toSeq === Seq(
        ("2024-01-01 09:30:00.0", 3L, 4L),
        ("2024-01-01 10:00:00.0", 3L, 4L)))
    } finally q.stop()
  }

  test("stream-stream time-bounded join matches only within the bound") {
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val c = clicks.toDF.toDF("uid", "cts")
    val v = views.toDF.toDF("vuid", "vts").withColumnRenamed("vuid", "uid")
    val joined = StreamOps.timeBoundedJoin(c, v, "uid", "cts", "vts",
      before = "interval 5 minutes", after = "interval 0 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(10)), (2L, ts(10)))
      views.addData((1L, ts(7)),   // within 5 min before: match
        (2L, ts(2)),               // 8 min before: out of bound
        (1L, ts(12)))              // after the click: out of bound
      q.processAllAvailable()
      val rows = ss.sql("SELECT uid, cts, vts FROM ssj")
        .collect().map(r => (r.getLong(0), r.getTimestamp(2)))
      assert(rows.toSeq === Seq((1L, ts(7))))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops repeats, keeps state bounded") {
    val in = MemoryStream[(Long, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val deduped = StreamOps.dedupWithinWatermark(
      in.toDF.toDF("k", "ts"), "ts", Seq("k"), watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdd")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(1)))  // dup of key 1
      q.processAllAvailable()
      in.addData((1L, ts(2)), (2L, ts(3)))               // still within horizon
      q.processAllAvailable()
      assert(ss.sql("SELECT k FROM sdd").as[Long].collect().sorted
        === Array(1L, 2L))
    } finally q.stop()
  }

  test("append-mode windows drop data later than the watermark") {
    val in = MemoryStream[(Timestamp, String)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val counts = in.toDF.toDF("ts", "token")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("token"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("token"), col("n"))
    val q = counts.writeStream.format("memory").queryName("lateq")
      .outputMode("append").start()
    try {
      in.addData((ts(1), "a"), (ts(3), "a"))
      q.processAllAvailable()
      in.addData((ts(30), "b")) // watermark -> 10:25, closes the 10:00 window
      q.processAllAvailable()
      in.addData((ts(2), "a")) // beyond-watermark straggler: must be DROPPED
      q.processAllAvailable()
      in.addData((ts(59), "c")) // close everything else
      q.processAllAvailable()
      val a = ss.sql("SELECT n FROM lateq WHERE token = 'a'").as[Long].collect()
      assert(a.toSeq === Seq(2L)) // the straggler neither re-emitted nor re-counted
    } finally q.stop()
  }

  test("stream-static join enriches the stream without stream-side state") {
    val in = MemoryStream[(Long, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")
    val joined = in.toDF.toDF("uid", "ts")
      .join(broadcast(dim), Seq("uid"), "left")
    val q = joined.writeStream.format("memory").queryName("ssd")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
      q.processAllAvailable()
      val rows = ss.sql("SELECT uid, tier FROM ssd").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
      assert(rows === Map(1L -> "gold", 2L -> "basic", 3L -> null))
    } finally q.stop()
  }

  test("session_window aggregation closes sessions on the gap") {
    val in = MemoryStream[(Long, Timestamp)]
    def ts(m: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:$sec%02d")
    val sessions = in.toDF.toDF("uid", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("uid"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("uid"), col("session_window.start").as("s"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sw")
      .outputMode("complete").start()
    try {
      // two bursts for uid 1 separated by > 5 min -> two sessions
      in.addData((1L, ts(0)), (1L, ts(2)), (1L, ts(20)), (2L, ts(1)))
      q.processAllAvailable()
      val got = ss.sql("SELECT uid, n FROM sw ORDER BY uid, s").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("left-outer time-bounded join null-pads once the watermark closes the bound") {
    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val c = clicks.toDF.toDF("uid", "cts")
    val v = views.toDF.toDF("vuid", "vts").withColumnRenamed("vuid", "uid")
    val joined = StreamOps.timeBoundedJoinLeftOuter(c, v, "uid", "cts", "vts",
      before = "interval 5 minutes", after = "interval 0 minutes",
      watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssoj")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts(10)), (2L, ts(10))) // uid 2 has no view in range
      views.addData((1L, ts(7)))
      q.processAllAvailable()
      // advance both watermarks far past the bound so "no match" is final
      clicks.addData((9L, ts(59)))
      views.addData((9L, ts(58)))
      q.processAllAvailable()
      val rows = ss.sql("SELECT uid, vts FROM ssoj WHERE uid IN (1, 2)")
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getTimestamp(1)))
        .sortBy(_._1)
      // uid 1 matched inside the bound; uid 2 emitted null-padded only
      // after the watermark proved no in-range view can still arrive
      assert(rows.toSeq === Seq((1L, ts(7)), (2L, null)))
    } finally q.stop()
  }

  test("sessionCloseAlerts: event-time timers fire when the watermark passes the gap") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = ss.conf.getOption(key)
    ss.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, Timestamp)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val alerts = StreamOps.sessionCloseAlerts(
      in.toDF.toDF("sensor", "ts"), "sensor", "ts", gapMs = 5 * 60 * 1000L)
    val q = alerts.writeStream.format("memory").queryName("sca")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0)), (1L, ts(2)), (2L, ts(1)))
      q.processAllAvailable()
      // watermark still at 10:02 — no session is 5 min quiet yet
      assert(ss.sql("SELECT * FROM sca").count() === 0)
      // key 1 stays quiet; key 2's new event slides its own timer and
      // pushes the watermark past key 1's 10:02+5min deadline
      in.addData((2L, ts(20)))
      q.processAllAvailable()
      in.addData((3L, ts(40))) // advance watermark past key 2's deadline
      q.processAllAvailable()
      val got = ss.sql("SELECT key, session_end_sec, n_events FROM sca")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(got.toSeq === Seq(
        (1L, ts(2).getTime / 1000, 2L),   // closed by key 2's progress
        (2L, ts(20).getTime / 1000, 2L))) // closed by key 3's progress
    } finally {
      q.stop()
      prev match {
        case Some(p) => ss.conf.set(key, p)
        case None => ss.conf.unset(key)
      }
    }
  }

  test("distinctUntilChanged emits change points only, state crosses batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = ss.conf.getOption(key)
    ss.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, Timestamp, Double)]
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val dc = StreamOps.distinctUntilChanged(
      in.toDF.toDF("sensor", "ts", "value"), "sensor", "ts", "value")
    val q = dc.writeStream.format("memory").queryName("duc")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0), 5.0), (1L, ts(1), 5.0), (1L, ts(2), 7.0),
        (2L, ts(0), 1.0))
      q.processAllAvailable()
      // repeat of the stored value across the batch boundary: suppressed
      in.addData((1L, ts(3), 7.0), (1L, ts(4), 5.0), (2L, ts(5), 1.0))
      q.processAllAvailable()
      val got = ss.sql("SELECT key, ts_sec, value FROM duc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      assert(got.toSeq === Seq(
        (1L, ts(0).getTime / 1000, 5.0),
        (1L, ts(2).getTime / 1000, 7.0),
        (1L, ts(4).getTime / 1000, 5.0), // change BACK is a change point
        (2L, ts(0).getTime / 1000, 1.0)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => ss.conf.set(key, p)
        case None => ss.conf.unset(key)
      }
    }
  }

  test("streamingLastTouch matches the batch attribution rollup across batches") {
    import graft.operators.Attribution
    // real sf0.001 events, globally time-ordered (ties resolved like the
    // batch operator: touches before same-ts conversions, then event_id)
    // and split into three micro-batches — per-user in-order delivery
    val rows = table("events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .sortBy { case (eid, t, _, ty) =>
        // FULL microsecond precision (getTime is ms-truncated): the
        // operator compares unix_micros, so two same-millisecond events
        // must not be split across micro-batches in the wrong order
        (t.getTime * 1000 + (t.getNanos / 1000) % 1000,
          if (ty == "click" || ty == "view") 0 else 1, eid) }
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
    val in = MemoryStream[(Long, Timestamp, Long, String)]
    val df = in.toDF.toDF("event_id", "ts", "user_id", "event_type")
    val sm = StreamOps.streamingLastTouch(df, Seq("click", "view"),
      "purchase", lookbackDays = 7)
    val q = sm.writeStream.format("memory").queryName("slt")
      .outputMode("append").start()
    try {
      chunks.foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = ss.sql("SELECT channel, count(*) FROM slt GROUP BY channel")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = Attribution.lastTouch(table("events"),
          Seq("click", "view"), "purchase", 7)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === batch,
        s"streaming $streamed != batch $batch")
      assert(streamed.values.sum ===
        table("events").filter(col("event_type") === "purchase").count())
    } finally q.stop()
  }
}
