package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling: null counts and exact distinct
  * counts for a set of columns, in ONE aggregation pass over the data.
  *
  * Multiple exact count-distincts plan through Catalyst's Expand
  * (one duplicated stream per distinct agg) with partial aggregation —
  * the standard one-pass multi-NDV shape. At 100 TB you would swap
  * `countDistinct` for `approx_count_distinct` (HLL, mergeable, no
  * Expand blow-up) per column where exactness isn't required; the
  * output schema is identical so downstream consumers don't change.
  */
object TableProfile {

  /** One row per profiled column: (col_name, n_nulls, n_distinct). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq((count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (col_name, n_nulls, n_distinct)
    val stackExpr = cols.map(c => s"'$c', __nulls_$c, __ndv_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackExpr) AS (col_name, n_nulls, n_distinct)")
  }
}
