package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Speed-layer token top-k: the reference delegates this to Storm and
  * retires its results hourly (SURVEY.md §1); here it is Structured
  * Streaming — event-time tumbling windows with a watermark bounding
  * state, incremental partial aggregation per micro-batch.
  */
object StreamingTopK {

  /** Watermarked windowed counts over a token stream. State per
    * (window, token) is dropped once the watermark passes the window
    * end — bounded memory at any input rate. */
  def windowedCounts(tokens: DataFrame, tsCol: String, tokenCol: String,
                     windowDur: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    tokens
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("win"), col(tokenCol).as("token"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("token"), col("cnt"))

  /** Top-k per window — ranking is not incremental, so it runs inside
    * foreachBatch / on the sink table, per micro-batch, over the tiny
    * aggregated state rather than the raw stream. */
  def topKPerWindow(counts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("win_start")
      .orderBy(col("cnt").desc, col("token").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Explode raw text rows into (ts, token) for windowedCounts. */
  def tokenize(rows: DataFrame, tsCol: String, textCol: String): DataFrame =
    rows.select(col(tsCol),
      explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("token"))
}
