package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe` — per-stage metrics
  * (rows in, rows dropped per gate, null rates) collected as aggregate
  * accumulators DURING the action, not as extra jobs. A curation
  * pipeline that reports "N docs in, X% dropped by the language gate,
  * Y% by quality" either re-runs a count per gate (one extra corpus
  * scan EACH — at 100 TB, unacceptable) or observes the metrics inline
  * for free; this wraps the latter.
  *
  * Batch: `Observation.get` blocks until the consuming action finishes
  * and returns the metric row. Streaming: the same `observe(name, ...)`
  * call surfaces per-batch rows in
  * `StreamingQueryProgress.observedMetrics` — one mechanism, both
  * modes. Metrics must be aggregates over the observed plan point
  * (Spark enforces no non-aggregate references).
  */
object PipelineMetrics {

  /** Attach named aggregate metrics at this point of the plan. Returns
    * the (lazily) instrumented frame and, for batch frames, the
    * Observation handle whose `.get` yields the metric map once an
    * action runs. Streaming frames get the name-keyed observe form
    * (`Observation` is batch-only) — read the rows from
    * `StreamingQueryProgress.observedMetrics(name)` per batch. */
  def observed(df: DataFrame, name: String,
               metrics: Map[String, Column]): (DataFrame, Option[Observation]) = {
    val cols = metrics.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    if (df.isStreaming) (df.observe(name, cols.head, cols.tail: _*), None)
    else {
      val obs = new Observation(name)
      (df.observe(obs, cols.head, cols.tail: _*), Some(obs))
    }
  }

  /** The standard curation-gate panel: total rows plus, per gate
    * predicate, how many rows FAIL it — computed inline on whatever
    * action consumes the frame (conditional count = the only shape
    * `observe` needs for drop-rate dashboards). */
  def gatePanel(df: DataFrame, name: String,
                gates: Map[String, Column]): (DataFrame, Option[Observation]) =
    observed(df, name,
      gates.map { case (g, pass) =>
        s"fail_$g" -> count_if(!pass)
      } + ("n_rows" -> count(lit(1))))
}
