package graft.operators

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: connected components over a candidate-pair
  * edge list, so an entire dup *group* ({A,B,C} found as A-B and B-C)
  * collapses to one canonical keeper — pairwise dedup alone would keep
  * B twice. The standard last stage of a MinHash/SimHash pipeline.
  *
  * Algorithm: iterative min-label propagation. Each pass joins current
  * labels across the (symmetrized) edge list and takes the min seen per
  * node; convergence in O(component diameter) passes. Near-dup
  * components are small and star-like (diameter ≤ ~3), so a handful of
  * passes suffice — for adversarial long-chain graphs the same loop
  * with the large-star/small-star pairing (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") drops to O(log n) rounds; the
  * per-pass plan here (shuffle on node id, map-side min combine) is
  * identical either way. The per-pass convergence check is one count()
  * of changed labels — labels are (id, label) pairs, never collected.
  */
object DedupCluster {

  /** (id, cluster_id): every node labeled with the min node id in its
    * connected component. `nodes` supplies the universe (singletons keep
    * their own id); `edges` columns `i`, `j`.
    *
    * Only edge-touched nodes iterate: a near-dup graph over a corpus
    * touches a small fraction of it, so the propagation loop runs on
    * |V(edges)| rows, not |corpus| rows — every untouched doc is a
    * singleton and joins the result at the end without ever entering
    * the loop. At 100 TB that is the difference between iterating over
    * megabytes and iterating over the corpus. */
  def components(nodes: DataFrame, idCol: String, edges: DataFrame,
                 maxIters: Int = 12): DataFrame = {
    val touched = components(edges, maxIters)
    nodes.select(col(idCol).as("id"))
      .join(touched.withColumnRenamed("id", "tid"),
        col("id") === col("tid"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Eagerly-localCheckpointed datasets pin their RDD blocks until the
    * driver GCs the RDD reference; inside the propagation loop that
    * means one pinned label table PER PASS. The checkpoint RDD sits
    * behind a `LogicalRDD` leaf, so unpersist it directly. */
  private def dropCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Components over ONLY the nodes present in the edge list.
    *
    * Loop mechanics (why this isn't a plain persist loop): each pass
    * ends in `localCheckpoint(eager)`, truncating the logical plan to
    * the materialized blocks — with persist alone the plan deepens
    * every pass and Catalyst re-optimizes the whole history (measured:
    * ~2.5 s/pass on a 256-edge graph, planning-bound). Convergence is
    * detected from sum(label): labels are min-monotone, so the sum
    * strictly decreases until fixpoint — one tiny agg on the fresh
    * checkpoint instead of a join against the previous pass. */
  def components(edges: DataFrame, maxIters: Int): DataFrame = {
    // persist the edge list BEFORE symmetrizing: the union's two
    // branches each traverse the edge plan, which for LSH pipelines
    // means running the candidate join twice. The symmetrized table is
    // cached PRE-PARTITIONED on the neighbor key `b` (r18, guide §2.4:
    // a persisted partitioning is this loop's bucketed table) — every
    // pass's neighbor-label lookup then shuffles only the node-sized
    // label table, never the edge list; pre-r18 the cached edges
    // re-exchanged each pass, an edge-sized shuffle × O(log d) passes.
    val e = edges.persist()
    val sym = e.select(col("i").as("a"), col("j").as("b"))
      .union(e.select(col("j").as("a"), col("i").as("b")))
      .repartition(col("b"))
      .persist()
    // the convergence sum rides each materializing action as an
    // `observe` metric (r18): labels are min-monotone so sum(label)
    // strictly decreases until fixpoint, and collecting it via the
    // CollectMetrics accumulator costs zero extra jobs — pre-r18 the
    // loop ran a separate aggregate job per pass just to read the sum.
    def observed(df: DataFrame): (DataFrame, Observation) = {
      val obs = Observation()
      (df.observe(obs, sum(col("label").cast("decimal(38,0)")).as("s")), obs)
    }
    def sumOf(obs: Observation): java.math.BigDecimal =
      obs.get("s").asInstanceOf[java.math.BigDecimal]
    val (l0, obs0) = observed(sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label")))
    var labels = l0.localCheckpoint(true)
    var prevSum = sumOf(obs0)
    var converged = prevSum == null // empty edge list: nothing to iterate
    var it = 0
    while (!converged && it < maxIters) {
      // min over self-label and all neighbors' labels: neighbor labels
      // attach on the CACHED edge partitioning (b), aggregate to the
      // min per node, then combine with the node's own label
      val nbr = sym
        .join(labels.select(col("id").as("_b"), col("label").as("nl")),
          col("b") === col("_b"))
        .groupBy(col("a")).agg(min(col("nl")).as("nl"))
      val prop = labels.join(nbr, labels("id") === nbr("a"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // pointer-jumping shortcut: label := label(label). Labels form a
      // forest with label(id) <= id, so composing halves path lengths —
      // neighbor-min alone needs O(diameter) passes (a chain-shaped dup
      // graph defeats any fixed cap); with this the loop is O(log d).
      val (nextObs, obs) = observed(prop.join(
          prop.select(col("id").as("lid"), col("label").as("ll")),
          prop("label") === col("lid"), "left")
        .select(col("id"), coalesce(col("ll"), col("label")).as("label")))
      val next = nextObs.localCheckpoint(true)
      val s = sumOf(obs)
      // `next` is fully materialized (eager checkpoint) — the previous
      // pass's checkpoint blocks are dead now. Dropping them here keeps
      // the loop's block footprint at one label table instead of one
      // per pass (ContextCleaner only reclaims them after a driver GC,
      // which a long-lived session may not run for a while).
      dropCheckpointBlocks(labels)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      it += 1
    }
    sym.unpersist()
    e.unpersist()
    if (!converged) {
      throw new IllegalStateException(
        s"DedupCluster.components did not converge in $maxIters passes; " +
          "raise maxIters (convergence is O(log diameter) with shortcutting)")
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
