package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are concatenated in a
  * deterministic order and cut into fixed token-budget bins (the
  * "packed sample" layout — max_len training rows with no padding
  * waste). A doc's bin is the bin its FIRST token lands in, i.e.
  * `floor(start_offset / budget)` where start_offset is the running
  * token count before the doc.
  *
  * Scale shape: one shuffle on the stream key (source/shard), one
  * window pass for the running sum — the same lower bound as any
  * per-shard computation. No driver state: at 100 TB each shard packs
  * independently, exactly how a sharded tokenizer-writer would.
  */
object Packing {

  /** Adds `start_off` (tokens before this doc within its shard) and
    * `bin` (fixed-budget bin index). Order within a shard is by
    * `orderCol` — a unique id, making packing deterministic. */
  def packGreedy(df: DataFrame, shardCol: String, orderCol: String,
                 tokCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("start_off",
        sum(col(tokCol)).over(w) - col(tokCol))
      .withColumn("bin", expr(s"start_off div $budget"))
  }

  /** Per (shard, bin) rollup: docs packed and token fill. */
  def binStats(df: DataFrame, shardCol: String, orderCol: String,
               tokCol: String, budget: Int): DataFrame =
    packGreedy(df, shardCol, orderCol, tokCol, budget)
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("tok_sum"))
}
