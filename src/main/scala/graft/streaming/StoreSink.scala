package graft.streaming

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.sources.ResultStore

/** Serving-layer wiring for the Lambda pair the reference implements:
  *
  *  - the SPEED path (streaming): update-mode micro-batches contain
  *    only re-aggregated keys, so each batch is keyed-UPSERTed via
  *    foreachBatch — idempotent under replay, no range deletes (a
  *    range delete would retire sibling keys the batch didn't touch).
  *  - the BATCH path (`publishWindow`): an authoritative recompute of
  *    a whole window range-deletes the speed layer's rows for
  *    [from, to) and inserts its own — exactly the reference's ES
  *    delete-by-query + bulk upsert (App.java:104-127,163-186).
  */
object StoreSink {

  /** Streaming side: keyed upsert per micro-batch. */
  def writer(counts: DataFrame, store: ResultStore,
             checkpointDir: String): DataStreamWriter[Row] =
    counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.upsert(batch)
      }

  def start(counts: DataFrame, store: ResultStore, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    writer(counts, store, checkpointDir).trigger(trigger).start()

  /** Batch side: retire everything in [from, to) and install the
    * authoritative recompute. */
  def publishWindow(store: ResultStore, authoritative: DataFrame,
                    from: Instant, to: Instant): Unit = {
    store.rangeDelete(from, to)
    store.upsert(authoritative)
  }
}
