package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose
  * timestamp is <= the left row's, within the same key — the
  * time-series point-lookup (kdb aj, pandas merge_asof, DuckDB ASOF
  * JOIN). The reference's lambda batch layer has no such operator; it
  * belongs to the time-window family its speed layer implies.
  *
  * Scale shape: NOT a join at all. Both sides are tagged, unioned, and
  * swept by one window pass ordered by (ts, side) within each key —
  * right-side values are carried forward with `last(ignoreNulls)`. One
  * shuffle on the key (the same one any per-key sort needs), no range
  * cross-product, no per-row probe; skew is bounded by per-key row
  * counts, and AQE splits hot keys. An inequality-join formulation
  * would be O(left × right) per key; this is O(n log n) per key.
  */
object AsOfJoin {

  /** Left rows + `rightVal` = the named right column's value as of the
    * left row's time (right rows at exactly the same ts DO match, with
    * the largest `rightVal` winning deterministic tie-break). Left rows
    * with no prior right row get null. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTs: String, rightTs: String, rightVal: String,
           outCol: String): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(rightVal).dataType))
    val r = right.select(col(keyCol), col(rightTs).as("__ts"), lit(0).as("__side"),
      col(rightVal).as("__rv"))
    val u = l.select(col(keyCol), col("__ts"), col("__side"), col("__rv"),
        struct(left.columns.map(col): _*).as("__l"))
      .unionByName(r.withColumn("__l",
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields))))
    // __side 0 before 1 at equal ts => right rows at the same instant
    // are visible to the left row; __rv asc => ties pick the max value.
    val w = Window.partitionBy(keyCol).orderBy(col("__ts").asc, col("__side").asc,
        col("__rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(outCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col(outCol))
  }
}
