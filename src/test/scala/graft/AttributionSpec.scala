package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.operators.Attribution

/** Edge semantics of the attribution probe/carry rewrites — the cases
  * the DuckDB oracle's aggregate output can mask: exact lookback
  * boundaries, same-timestamp ties, zero-touch conversions. */
class AttributionSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String, Double)*): DataFrame = {
    import SparkSpec.spark.implicits._
    rows.toSeq.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def lastTouchMap(df: DataFrame): Map[String, (Long, Double)] =
    Attribution.lastTouch(df, Seq("click", "view"), "purchase", 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap

  test("lastTouch: latest touch wins; same-ts touch counts; stale touch is (none)") {
    val df = events(
      // user 1: view then click -> click wins
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-02 10:00:00", 1L, "click", 0.0),
      (3L, "2024-01-03 10:00:00", 1L, "purchase", 10.0),
      // user 2: touch at EXACTLY the purchase ts attributes (ts <= conv)
      (4L, "2024-01-05 12:00:00", 2L, "view", 0.0),
      (5L, "2024-01-05 12:00:00", 2L, "purchase", 20.0),
      // user 3: only touch is 8 days old -> outside the 7-day lookback
      (6L, "2024-01-01 00:00:00", 3L, "click", 0.0),
      (7L, "2024-01-09 00:00:01", 3L, "purchase", 30.0))
    val m = lastTouchMap(df)
    assert(m === Map("click" -> ((1L, 10.0)), "view" -> ((1L, 20.0)),
      "(none)" -> ((1L, 30.0))))
  }

  test("lastTouch: boundary at exactly lookback days is exclusive") {
    // touch at conv.ts - 7d exactly: window is (ts-7d, ts], so excluded
    val df = events(
      (1L, "2024-01-01 00:00:00", 1L, "click", 0.0),
      (2L, "2024-01-08 00:00:00", 1L, "purchase", 5.0))
    assert(lastTouchMap(df) === Map("(none)" -> ((1L, 5.0))))
  }

  test("linear: credit splits over in-window touches only; zero-touch is (none)") {
    val df = events(
      // user 1: 1 click + 3 views in window -> 0.25 / 0.75
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-03 10:00:00", 1L, "view", 0.0),
      (4L, "2024-01-04 10:00:00", 1L, "view", 0.0),
      (5L, "2024-01-05 10:00:00", 1L, "purchase", 0.0),
      // user 1 second purchase later: same touches still in its window
      (6L, "2024-01-06 10:00:00", 1L, "purchase", 0.0),
      // user 2: no touches at all
      (7L, "2024-01-05 00:00:00", 2L, "purchase", 0.0),
      // user 3: touch outside the window does not count
      (8L, "2024-01-01 00:00:00", 3L, "view", 0.0),
      (9L, "2024-01-09 00:00:01", 3L, "purchase", 0.0))
    val m = Attribution.linear(df, "click", "view", "purchase", 7)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet === Set("click", "view", "(none)"))
    assert(math.abs(m("click") - 0.5) < 1e-9)   // 0.25 x 2 purchases
    assert(math.abs(m("view") - 1.5) < 1e-9)    // 0.75 x 2 purchases
    assert(m("(none)") === 2.0)                 // user 2 + user 3
  }

  test("linear and lastTouch credit totals equal the conversion count") {
    val ev = table("events")
    val nConv = ev.filter(org.apache.spark.sql.functions.col("event_type")
      === "purchase").count()
    val lin = Attribution.linear(ev, "click", "view", "purchase", 7)
      .agg(org.apache.spark.sql.functions.sum("attr_convs")).head().getDouble(0)
    assert(math.abs(lin - nConv) < 1e-6, s"linear credits $lin != $nConv")
    val lt = Attribution.lastTouch(ev, Seq("click", "view"), "purchase", 7)
      .agg(org.apache.spark.sql.functions.sum("n_conv")).head().getLong(0)
    assert(lt === nConv)
  }
}
