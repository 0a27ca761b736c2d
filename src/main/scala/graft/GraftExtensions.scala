package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** SparkSessionExtensions injector: enable with
  * `--conf spark.sql.extensions=graft.GraftExtensions` to get the
  * graft_* SQL functions in every session out of the box. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopK.Strategy)
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthFilter)
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
  }
}
