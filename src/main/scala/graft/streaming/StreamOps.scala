package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Additional speed-layer operators: stream-stream join and streaming
  * dedup — the incremental counterparts of the batch join and
  * Dedup.exact paths.
  */
object StreamOps {

  /** Event-time-bounded stream-stream inner join: left rows match right
    * rows with the same key whose timestamp lies in [leftTs - before,
    * leftTs + after]. Both sides carry watermarks and the join condition
    * bounds the time skew, so each side's buffered state is evictable —
    * the two conditions Spark requires to avoid unbounded state growth.
    * Column names must be disjoint apart from the key. */
  def timeBoundedJoin(left: DataFrame, right: DataFrame, keyCol: String,
                      leftTs: String, rightTs: String,
                      before: String = "interval 10 minutes",
                      after: String = "interval 10 minutes",
                      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) - expr(before) &&
        r(rightTs) <= l(leftTs) + expr(after))
      .drop(r(keyCol))
  }

  /** Streaming exact dedup on a key expression with watermark-bounded
    * state: a key is remembered only until the watermark passes its
    * event time (`dropDuplicatesWithinWatermark`), so state stays
    * bounded while duplicates within the lateness horizon — the only
    * ones a correct pipeline can see — are removed. */
  def dedupWithinWatermark(rows: DataFrame, tsCol: String, keyCols: Seq[String],
                           watermark: String = "10 minutes"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
