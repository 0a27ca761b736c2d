package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation patterns.
  *
  * Plain counts don't skew at the reducer: map-side partial aggregation
  * bounds each reducer's load to (partitions × keys) partial rows. The
  * aggregations that DO melt a reducer under a hot key are the ones
  * partial agg can't compress — count(DISTINCT x) being the canonical
  * case (every distinct value of the hot key lands on one reducer).
  *
  * `countDistinctSalted` stays EXACT: stage 1 groups by (key,
  * hash(value) % buckets) — a hot key's distinct values split across
  * `buckets` reducers, each deduping a disjoint value slice — stage 2
  * sums the disjoint partial distinct counts. Same two-shuffle shape as
  * a plain distinct-count, but the widest reducer shrinks by ~buckets×.
  */
object SkewAgg {

  /** Exact count-distinct of `value` per `key`, salted over `buckets`
    * reducers for hot keys. */
  def countDistinctSalted(df: DataFrame, key: String, value: String,
                          buckets: Int, outCol: String = "n_distinct"): DataFrame =
    df.select(col(key), col(value))
      .withColumn("_salt", pmod(xxhash64(col(value)), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(outCol))
}
