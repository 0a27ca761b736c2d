package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Deliberate whole-input windows over BOUNDED relations.
  *
  * An unpartitioned `Window.orderBy(...)` is the right plan when the
  * input is small by construction (a value histogram, a vocab table, a
  * 16-row bucket table) — but `WindowExec` logs a scary
  * "No Partition Defined … single partition" warning for every such
  * site, and at ~260 instances per Verify run nobody can spot a REAL
  * data-sized regression of this class in the noise.
  *
  * `boundedGlobal(why)` replaces those sites: the window is partitioned
  * by a CONSTANT key, which is physically identical to the global
  * window (every row hashes to the one populated partition; ordering,
  * frames, and ranks are unchanged) but carries a non-empty partition
  * spec, so WindowExec does not warn — and the `why` string rides into
  * the plan as the literal key, making every suppression
  * self-documenting in `explain()` output. The contract: ONLY call
  * this with a stated cardinality bound; a site that cannot name its
  * bound must partition for real instead.
  */
object BoundedWindow {

  /** Spark 4's `EliminateWindowPartitions` optimizer rule folds
    * constant partition keys away — which would turn every bounded
    * window back into the warning-generating global form. Excluding
    * it is safe and precisely scoped: foldable window partition keys
    * exist in this codebase ONLY as boundedGlobal markers, the
    * physical plan is identical either way (one exchange to one
    * populated partition), and a genuinely unpartitioned window still
    * warns — the regression signal this helper exists to protect.
    * The "only as boundedGlobal markers" invariant is ASSERTED by
    * PlanSpec ("every foldable window partition key is a boundedGlobal
    * marker"), which walks every query's analyzed plan. */
  private val ElimRule =
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"

  /** Idempotently exclude the folding rule on the active session.
    * Called by [[boundedGlobal]]; also call directly before running
    * shared ANSI SQL that spells a bounded window as
    * `OVER (PARTITION BY 'bounded: …')` (e.g. the chi-square cell
    * table), since that path never builds a WindowSpec. */
  def ensureRuleExcluded(): Unit =
    SparkSession.getActiveSession.foreach { s =>
      val key = "spark.sql.optimizer.excludedRules"
      val cur = s.conf.getOption(key).filter(_.nonEmpty)
      if (!cur.exists(_.split(",").map(_.trim).contains(ElimRule)))
        s.conf.set(key, cur.fold(ElimRule)(c => s"$c,$ElimRule"))
    }

  /** A global window over a bounded input. `why` must name the
    * cardinality bound (e.g. "value histogram ≤ num distinct prices");
    * it becomes the constant partition key visible in the plan. */
  def boundedGlobal(why: String): WindowSpec = {
    ensureRuleExcluded()
    Window.partitionBy(lit(s"bounded: $why"))
  }
}
