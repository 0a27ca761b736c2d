package graft.sources

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable serving-layer result store with the reference's
  * Elasticsearch semantics re-expressed engine-neutrally: the batch
  * layer retires the speed layer's rows for the recomputed window
  * (delete-by-query on timestamp ∈ [from, to), reference
  * App.java:104-127,150-161) and upserts its own authoritative rows
  * (the bulk-upsert sketch at App.java:163-186).
  *
  * A real deployment would back this with ES/OpenSearch/Delta; the
  * parquet impl below keeps identical semantics for offline tests.
  */
trait ResultStore {
  /** Delete rows with tsCol in [from, to) — retire speed-layer output. */
  def rangeDelete(from: Instant, to: Instant): Unit
  /** Insert-or-replace by key column. */
  def upsert(rows: DataFrame): Unit
  def read(): DataFrame
}

/** Parquet-backed ResultStore. Rewrites are full-snapshot (read →
  * transform → overwrite staging → swap); fine for serving-sized
  * result tables, which are top-k aggregates, not raw data. The
  * key/timestamp column names are fixed at construction.
  */
final class ParquetResultStore(spark: SparkSession, path: String,
                               keyCol: String, tsCol: String) extends ResultStore {

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def exists: Boolean = fs.exists(new org.apache.hadoop.fs.Path(path))

  override def read(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.emptyDataFrame

  /** Read-modify-overwrite through a staging dir: parquet can't
    * overwrite a path while reading it, and a failed rewrite must not
    * destroy the store. */
  private def rewrite(df: DataFrame): Unit = {
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val target = new org.apache.hadoop.fs.Path(path)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), target)
  }

  override def rangeDelete(from: Instant, to: Instant): Unit = {
    if (exists) {
      val ts = col(tsCol)
      rewrite(read().filter(
        ts < lit(java.sql.Timestamp.from(from)) ||
          ts >= lit(java.sql.Timestamp.from(to))))
    }
  }

  override def upsert(rows: DataFrame): Unit = {
    val cur = read()
    if (cur.isEmpty) rewrite(rows)
    else rewrite(cur.join(rows.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(rows))
  }
}
