package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint-restart recovery: the exactly-once contract a production
  * pipeline leans on — a stream stopped mid-backlog and restarted from
  * the same checkpoint must neither drop nor duplicate rows, including
  * rows that arrived while it was down. File source + parquet sink is
  * the end-to-end pair with replayable offsets + idempotent commits.
  */
class RecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("payload", StringType)))

  private def writeBatch(dir: String, ids: Range): Unit = {
    import SparkSpec.spark.implicits._
    ids.map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  test("file-stream restart from checkpoint is exactly-once") {
    val src = tmpDir("rec-src")
    val sink = tmpDir("rec-sink")
    val ckpt = tmpDir("rec-ckpt")

    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .withColumn("doubled", col("id") * 2)
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .start()

    writeBatch(src, 0 until 10)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    // rows land while the query is DOWN; restart must pick them up
    // from the checkpointed offset — no re-read of batch 1, no miss
    writeBatch(src, 10 until 25)
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(sink)
    assert(out.count() === 25) // no duplicates, no drops
    assert(out.select(sum(col("doubled"))).head().getLong(0) === (0 until 25).map(_ * 2).sum)
    assert(out.select(countDistinct(col("id"))).head().getLong(0) === 25)
  }
}
