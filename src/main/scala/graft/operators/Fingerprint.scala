package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken-style):
  * hash all character k-grams, slide a window of w hashes, keep each
  * window's minimum — guarantees any match of length ≥ k + w − 1 shares
  * a fingerprint, with ~2/(w+1) selection density.
  *
  * One scan, all builtin functions. The k-gram hash array is staged
  * through a projection so the winnowing lambda captures an attribute —
  * capturing the gram subtree would re-hash the whole text per window
  * (O(n²); see the Dedup scaladoc evaluation-shape rule).
  */
object Fingerprint {

  /** (id, fps): winnowed fingerprint set, distinct + sorted, via the
    * one-pass native expression (hash-identical to fingerprintDfHof,
    * asserted in NativeExprSpec). */
  def fingerprintDf(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.NativeExpressions.winnow(col(textCol), k, w).as("fps"))

  /** fingerprintDf with the md5-prefix 60-bit k-gram hash instead of
    * xxhash64: same winnowing (sliding-min, distinct, sorted), but the
    * gram hash is reproducible in an external SQL oracle as
    * `('0x' || substring(md5(gram), 1, 15))::BIGINT` — which makes the
    * whole fingerprint oracle-checkable, not just rows-countable. */
  def fingerprintMd5Df(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.NativeExpressions.winnow(col(textCol), k, w, md5 = true).as("fps"))

  /** HOF reference implementation, kept as the parity oracle for the
    * native expression. */
  def fingerprintDfHof(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, w: Int = 4): DataFrame =
    docs
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .select(col("id"),
        when(length(col("t")) >= k,
          transform(sequence(lit(1), length(col("t")) - lit(k - 1)),
            i => xxhash64(substr(col("t"), i, lit(k)))))
          .otherwise(array().cast("array<bigint>")).as("g"))
      .select(col("id"),
        when(size(col("g")) - lit(w - 1) >= 1,
          array_sort(array_distinct(transform(
            sequence(lit(1), size(col("g")) - lit(w - 1)),
            i => array_min(slice(col("g"), i, lit(w)))))))
          .otherwise(array_sort(array_distinct(col("g")))).as("fps"))

  /** (id, fp) exploded pairs for overlap joins. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame =
    fingerprintDf(docs, idCol, textCol, k, w)
      .select(col("id"), explode(col("fps")).as("fp"))

  /** Docs sharing ≥ minShared fingerprints — plagiarism-style overlap.
    * The join is per-fingerprint (equi), never all-pairs. */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
                   minShared: Int, k: Int = 8, w: Int = 4): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, k, w)
    fps.as("a").join(fps.as("b"),
      col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
