package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization via window functions.
  *
  * Two passes over one partitioning (user): lag → new-session flag →
  * running sum = session sequence number. Spark plans both window
  * functions over the SAME (partition, order), so the input shuffles
  * once on the user key and both passes run in a single sort — at
  * 100 TB that is one shuffle of the events table, which is the lower
  * bound for any per-user computation.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per user). `tieBreak` makes the
    * within-user order total so results are deterministic. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 tieBreak: String, gapSec: Double): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreak))
    val sec: Column = col(tsCol).cast("double")
    val gap = sec - lag(sec, 1).over(w)
    val isNew = when(gap.isNull || gap > gapSec, 1).otherwise(0)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: bounds (floor epoch seconds) and event count. */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
               tieBreak: String, gapSec: Double): DataFrame = {
    val sec: Column = col(tsCol).cast("double")
    sessionize(df, userCol, tsCol, tieBreak, gapSec)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        floor(min(sec)).cast("long").as("start_s"),
        floor(max(sec)).cast("long").as("end_s"))
  }
}
