package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval × point range join via coarse binning.
  *
  * A naive `point BETWEEN start AND end` join has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin — O(|points| × |intervals|) and a
  * driver-melting broadcast at 100 TB. Binning restores an equi-key:
  * each interval is exploded onto every bin of width `binDays` it
  * overlaps (⌈span/bin⌉ rows, a small constant for bounded spans), each
  * point lands in exactly one bin, the join shuffles on the bin id like
  * any equi-join, and the exact range predicate filters the per-bin
  * candidates. Each (interval, point) candidate meets in exactly one
  * bin — the point's — so no post-join dedup is needed.
  */
object RangeJoin {

  private def binOf(d: Column, binDays: Int): Column =
    floor(unix_date(d.cast("date")) / binDays)

  /** Inner range join: points p with `dateCol` in
    * [interval.startCol, interval.startCol + spanDays). Output = all
    * interval columns + all point columns. */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      startCol: String, spanDays: Int,
                      dateCol: String, binDays: Int = 7): DataFrame = {
    val nBins = spanDays / binDays + 2
    val iv = intervals
      .withColumn("__b0", binOf(col(startCol), binDays))
      .withColumn("__bin", explode(sequence(col("__b0"), col("__b0") + lit(nBins - 1))))
      .drop("__b0")
    val pt = points.withColumn("__bin", binOf(col(dateCol), binDays))
    iv.join(pt, Seq("__bin"))
      .filter(col(dateCol).cast("date") >= col(startCol).cast("date") &&
        col(dateCol).cast("date") < date_add(col(startCol).cast("date"), spanDays))
      .drop("__bin")
  }

  /** Interval × interval overlap join, same binning idea: both sides
    * explode onto their covered bins, the join shuffles on the bin id,
    * the exact overlap predicate filters candidates. An overlapping
    * pair meets in every shared bin, so instead of a dedup shuffle the
    * filter keeps only the bin containing the LATER start — overlap
    * means that date lies inside both intervals, so both sides exploded
    * onto its bin, and it is unique per pair. Intervals are
    * [start, start + span days), half-open. */
  def intervalOverlap(left: DataFrame, lStart: String, lSpanDays: Int,
                      right: DataFrame, rStart: String, rSpanDays: Int,
                      binDays: Int = 7): DataFrame = {
    def explodeBins(df: DataFrame, startCol: String, spanDays: Int): DataFrame = {
      val nBins = spanDays / binDays + 2
      df.withColumn("__b0", binOf(col(startCol), binDays))
        .withColumn("__bin", explode(sequence(col("__b0"), col("__b0") + lit(nBins - 1))))
        .drop("__b0")
    }
    val la = explodeBins(left, lStart, lSpanDays)
    val rb = explodeBins(right, rStart, rSpanDays)
    val lS = col(lStart).cast("date")
    val rS = col(rStart).cast("date")
    la.join(rb, Seq("__bin"))
      .filter(lS < date_add(rS, rSpanDays) && rS < date_add(lS, lSpanDays) &&
        col("__bin") === binOf(greatest(lS, rS), binDays))
      .drop("__bin")
  }
}
