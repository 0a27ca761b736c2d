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

  /** Salted shuffle join for a skewed fact key against a small-but-not-
    * broadcastable build side: the fact takes a deterministic salt from
    * a row-content hash (never rand() — re-runs and task retries must
    * route a row identically), the build side replicates `buckets`
    * times, and the join key becomes (key, salt) — a hot fact key now
    * spreads over `buckets` reducers instead of one. Result is
    * row-identical to the unsalted join (inner, and every build row
    * exists under every salt). AQE's skew-split handles moderate skew
    * on its own; explicit salting is for the pathological key that
    * exceeds a single task even after AQE splits, or when the skew is
    * known ahead of time and re-planning costs matter. */
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
                 buildKey: String, buckets: Int,
                 saltSource: Column): DataFrame = {
    // coalesce: a NULL saltSource must still route to a bucket (a NULL
    // salt would silently drop the row from the join)
    val salted = fact.withColumn("_salt",
      coalesce(pmod(xxhash64(saltSource), lit(buckets)), lit(0L)))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated,
      salted(factKey) === replicated(buildKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
