package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data curation.
  *
  * `sample()`/`TABLESAMPLE` draw a different subset on every run and
  * every partitioning; a hash predicate on content draws the SAME
  * subset on any engine, any run, any cluster size — reproducible
  * splits, and a doc keeps its fate when the corpus is re-scanned
  * incrementally. Pure narrow filter: pushes into the scan, no shuffle,
  * no state.
  */
object Sampling {

  /** Keep rows whose md5(key) hex prefix sorts below `thresholdHex4`
    * (4 hex digits => rate ≈ parse(thresholdHex4, 16) / 65536; "1999"
    * ≈ 10%). Lexicographic compare of lowercase hex == numeric compare,
    * identical in any engine with md5. */
  def hashFilter(key: Column, thresholdHex4: String): Column =
    substring(md5(key.cast("string")), 1, 4) < lit(thresholdHex4.toLowerCase)

  def hashSample(df: DataFrame, keyCol: String, thresholdHex4: String): DataFrame =
    df.filter(hashFilter(col(keyCol), thresholdHex4))

  /** Exactly-k-per-stratum deterministic sample: rank rows inside each
    * stratum by md5(key) — a uniform, content-stable order — and keep
    * the first k. The fixed-size counterpart of `hashSample` (reservoir
    * sampling without the nondeterminism), the standard way to cut
    * per-source eval sets. One shuffle on the stratum; rank is a
    * per-group top-k, never a global sort. */
  def topKPerStratum(df: DataFrame, keyCol: String, stratumCol: String,
                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= k).drop("_rk")
  }

  /** Per-stratum deterministic rates: stratum -> 4-hex-digit threshold,
    * e.g. downsample an over-represented source while keeping all of a
    * rare one. Unlisted strata are dropped. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           rates: Map[String, String]): DataFrame = {
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, hex)) =>
        when(col(stratumCol) === stratum, lit(hex.toLowerCase)).otherwise(acc)
    }
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 4) < threshold)
  }
}
