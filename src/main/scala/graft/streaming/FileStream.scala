package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-based streaming source over the hive-partitioned hour layout —
  * the streaming twin of sources.PartitionedSource. New files landing
  * under year=/month=/day=/hour= directories are discovered
  * incrementally; partition values surface as columns.
  *
  * maxFilesPerTrigger bounds per-batch work so a backlog (e.g. first
  * start against a year of history) streams through in bounded-memory
  * batches instead of one giant batch.
  */
object FileStream {

  def parquet(spark: SparkSession, basePath: String, schema: StructType,
              maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("basePath", basePath)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(basePath + "/*/*/*/*")
}
