package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hop-bounded breadth-first search over an edge list — reachability /
  * graph-distance labeling (e.g. link-distance from a seed set as a
  * crawl-quality signal, or vocabulary distance from anchor terms).
  *
  * Scale shape: classic frontier BFS — each hop is one src-keyed
  * equi-join of the (node-sized) frontier against the edge list plus
  * one left-anti join against the visited set; nothing edge²-sized
  * ever materializes, nothing is collected. The edge list is
  * partitioned on src once and persisted, so every hop's join reuses
  * the layout and only shuffles the frontier. The visited table is
  * localCheckpoint'd per hop so the plan depth stays O(1) (the
  * DedupCluster planning-cost lesson); a pass's checkpoint blocks are
  * dropped as soon as the next pass lands.
  */
object Graph {

  /** See DedupCluster.dropCheckpointBlocks — the checkpoint RDD sits
    * behind a LogicalRDD leaf; unpersist it directly. */
  private def dropCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** (node, dist): minimum hop count (≤ maxHops) from any seed, seeds
    * at dist 0. `seeds` needs a `node` column; unreachable nodes are
    * absent. Early-exits when a frontier empties. */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).persist()
    var dist = seeds.select(col("node"), lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = dist
    var hop = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("dist"))
        .localCheckpoint(true)
      exhausted = next.isEmpty
      val grown = dist.union(next).localCheckpoint(true)
      dropCheckpointBlocks(frontier)
      dropCheckpointBlocks(dist)
      dist = grown
      frontier = next
    }
    if (frontier ne dist) dropCheckpointBlocks(frontier)
    e.unpersist(blocking = false)
    dist
  }
}
