package graft

import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.JaccardLengthFilter

/** The injected optimizer rule: jaccard-threshold filters gain the
  * length prefilter, results never change, and the rewrite does not
  * stack under the optimizer's fixpoint batch. */
class JaccardRuleSpec extends SparkSpec {

  private def jaccardQuery = Dedup
    .jaccardPairs(table("documents"), "doc_id", "text", 3, 40)
    .filter(col("jac") >= 0.8)

  test("rule adds the length conjuncts exactly once and keeps results identical") {
    val before = jaccardQuery.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ JaccardLengthFilter
    try {
      val q = jaccardQuery
      // the optimized plan now carries t·size(x) comparisons (the
      // predicate may live in a Filter or a pushed-down Join condition)
      var scaledSizeCompares = 0
      q.queryExecution.optimizedPlan.foreach { node =>
        node.expressions.foreach(_.foreach {
          case GreaterThanOrEqual(_, Multiply(_, _, _)) => scaledSizeCompares += 1
          case _ => ()
        })
      }
      // one guard = two conjuncts; fixpoint must not have stacked more
      assert(scaledSizeCompares === 2, q.queryExecution.optimizedPlan.toString)
      val after = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after === before)
      assert(after.nonEmpty)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rule leaves non-jaccard filters untouched") {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ JaccardLengthFilter
    try {
      val q = table("orders").filter(col("o_totalprice") >= 100.0)
      val sizes = q.queryExecution.optimizedPlan.collect {
        case f: Filter => f.condition.collect { case s: Size => s }.size
      }.sum
      assert(sizes === 0)
    } finally spark.experimental.extraOptimizations = saved
  }
}
