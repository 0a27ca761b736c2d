package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution over an event stream (generalizes the
  * reference's per-window event analytics to the ad-tech staple; no
  * counterpart operator exists in the reference — this is the
  * LLM-pipeline/product-analytics extension surface).
  *
  * Both models avoid the textbook inequality join (`touch.ts ∈
  * (conv.ts − lookback, conv.ts]`) entirely — at 100 TB that join is a
  * per-user cross product. Instead everything rides ONE
  * (user → ts, kind, id) exchange+sort:
  *
  *  - [[lastTouch]] carries a running last-non-null touch struct past
  *    each conversion row and checks the lookback bound on the carried
  *    value (the AsOfJoin union trick);
  *  - [[linear]] needs the in-window touch COUNT, i.e. BOTH window
  *    endpoints — so beside each conversion a PROBE row at
  *    `ts − lookback` rides the same exchange, and the count is the
  *    difference of the two carried per-channel running-count
  *    snapshots.
  *
  * Ties at the same timestamp resolve by (kind, event_id): touches sort
  * before the probes and conversions they serve, deterministically.
  * Expected columns: user_id, ts, event_id, event_type.
  */
object Attribution {

  /** Per-channel attributed conversions + decimal-exact value under
    * last-touch: each `convType` event credits the user's latest touch
    * in `(ts − lookbackDays, ts]`, or `(none)`. */
  def lastTouch(events: DataFrame, touchTypes: Seq[String], convType: String,
                lookbackDays: Int): DataFrame = {
    val touches = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("kind"), col("event_type").as("channel"),
        lit(null).cast("decimal(18,2)").as("cv"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("kind"), lit(null).cast("string").as("channel"),
        col("value").cast("decimal(18,2)").as("cv"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = touches.union(convs)
      .withColumn("lt", last(when(col("kind") === 0,
        struct(col("ts").as("tts"), col("event_id").as("tid"),
          col("channel").as("tch"))), ignoreNulls = true).over(w))
    carried.filter(col("kind") === 1)
      .select(coalesce(when(col("lt.tts") >
          col("ts") - expr(s"INTERVAL $lookbackDays DAYS"),
          col("lt.tch")), lit("(none)")).as("channel"),
        col("cv"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conv"),
        sum(col("cv")).cast("double").as("attr_value"))
      .orderBy(col("channel"))
  }

  /** Per-channel fractional conversions under linear (equal-split)
    * multi-touch credit. Touch channels are limited to exactly two
    * (the per-channel running counts are materialized columns).
    * Fractional credits are round(9) doubles summed in DECIMAL, so the
    * rollup is order-independent. */
  def linear(events: DataFrame, chA: String, chB: String, convType: String,
             lookbackDays: Int): DataFrame = {
    val touches = events.filter(col("event_type").isin(chA, chB))
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id"), col("event_type").as("ch"))
    val convs0 = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("ts"), col("event_id"))
    val probes = convs0.select(col("user_id"),
      (col("ts") - expr(s"INTERVAL $lookbackDays DAYS")).as("ts"),
      lit(1).as("kind"), col("event_id"), lit(null).cast("string").as("ch"))
    val convs = convs0.select(col("user_id"), col("ts"),
      lit(2).as("kind"), col("event_id"), lit(null).cast("string").as("ch"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val counted = touches.union(probes).union(convs)
      .withColumn("cc", sum(when(col("kind") === 0 &&
        col("ch") === chA, 1L).otherwise(0L)).over(w))
      .withColumn("cv", sum(when(col("kind") === 0 &&
        col("ch") === chB, 1L).otherwise(0L)).over(w))
    // r18 (guide §2.4/§3.3): the probe and conversion snapshots pair
    // up with ONE conditional aggregation on the conversion id — each
    // cid has exactly one kind-1 and one kind-2 row — instead of the
    // old p ⋈ c self-join, whose two sides each re-ran the whole
    // union+window subtree (and the three credits-union branches then
    // re-ran the join: PlanAudit counted 18 events scans in one plan,
    // now 3 — one per union branch). The per-channel rollup collapses
    // to ONE singleton aggregate + a 3-row explode (the funnel shape):
    // same share expressions, same decimal sum, same presence rule
    // (chA/chB rows exist iff any k>0 conversion, '(none)' iff any
    // k=0), so values and schema are oracle-identical.
    val per = counted.filter(col("kind") =!= 0)
      .groupBy(col("event_id"))
      .agg(max(when(col("kind") === 1, col("cc"))).as("cc0"),
        max(when(col("kind") === 1, col("cv"))).as("cv0"),
        max(when(col("kind") === 2, col("cc"))).as("cc1"),
        max(when(col("kind") === 2, col("cv"))).as("cv1"))
      .withColumn("nc", col("cc1") - col("cc0"))
      .withColumn("nv", col("cv1") - col("cv0"))
      .withColumn("k", col("nc") + col("nv"))
    def share(n: Column) = round(n.cast("double") /
      col("k").cast("double"), 9).cast("decimal(20,9)")
    val one = per.agg(
      sum(when(col("k") > 0, share(col("nc")))).as("sa"),
      sum(when(col("k") > 0, share(col("nv")))).as("sb"),
      count_if(col("k") > 0).as("npos"),
      sum(when(col("k") === 0,
        lit(java.math.BigDecimal.ONE).cast("decimal(20,9)"))).as("sn"))
    one.select(explode(array(
        struct(lit(chA).as("channel"), col("sa").cast("double")
          .as("attr_convs"), (col("npos") > 0).as("keep")),
        struct(lit(chB).as("channel"), col("sb").cast("double")
          .as("attr_convs"), (col("npos") > 0).as("keep")),
        struct(lit("(none)").as("channel"), col("sn").cast("double")
          .as("attr_convs"), col("sn").isNotNull.as("keep")))).as("f"))
      .filter(col("f.keep"))
      .select(col("f.channel").as("channel"),
        col("f.attr_convs").as("attr_convs"))
      .orderBy(col("channel"))
  }
}
