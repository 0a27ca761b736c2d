package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter pre-join pruning: build a compact filter from
  * the dim side's join keys, broadcast it, and drop non-joining fact
  * rows BEFORE the join's shuffle. On a 100 TB fact where only a
  * fraction joins, the shuffle shrinks by the non-match rate at the
  * cost of one broadcast of a few MB of bits — the same idea as
  * Spark's AQE runtime bloom filters (spark.sql.optimizer.runtime.
  * bloomFilter.*), made explicit for when the dim side is computed and
  * the optimizer can't see the opportunity.
  *
  * The filter is one binary aggregate row cross-broadcast onto the
  * fact; `might_contain` has no false negatives, so results are
  * row-identical to the plain join (asserted in the spec).
  */
object BloomPrune {

  // BloomFilterAggregate / BloomFilterMightContain are the expressions
  // Spark's runtime-filter rule injects; they are not in the public
  // function registry, so they are constructed directly. might_contain
  // requires its filter as a constant or scalar subquery — the same
  // shape InjectRuntimeFilter produces — so the aggregate rides in as
  // a ScalarSubquery, which the planner turns into a broadcast-style
  // one-row subquery result reused by every fact task.
  private def bloomAgg(key: Column, items: Long, bits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(key)), Literal(items), Literal(bits))
      .toAggregateExpression())

  private def mightContain(bfSub: org.apache.spark.sql.catalyst.expressions.Expression,
                           key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      bfSub, GraftBridge.expression(xxhash64(key))))

  /** Fact rows that MIGHT join (superset, no false negatives). */
  def pruned(fact: DataFrame, dim: DataFrame, factKey: String,
             dimKey: String, expectedItems: Long = 1000000L,
             numBits: Long = 8388608L): DataFrame = {
    val bfPlan = dim.agg(bloomAgg(col(dimKey), expectedItems, numBits).as("__bf"))
      .queryExecution.analyzed
    val sub = org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bfPlan)
    fact.filter(mightContain(sub, col(factKey)))
  }

  /** Bloom-pruned inner equi-join, row-identical to the plain join. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, expectedItems: Long = 1000000L,
                 numBits: Long = 8388608L): DataFrame =
    pruned(fact, dim, factKey, dimKey, expectedItems, numBits)
      .join(dim, col(factKey) === col(dimKey))
}
