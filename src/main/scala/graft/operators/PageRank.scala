package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the link-centrality
  * quality signal crawl-derived corpora weight documents by (harmonic /
  * PageRank centrality à la CommonCrawl ranking).
  *
  * Scale shape: each iteration is one equi-join of the rank vector
  * against the edge list (shuffle keyed on src — edges with a hot src
  * are AQE-split) plus one dst-keyed aggregation; nothing is ever
  * collected, and the rank vector is node-sized, not edge-sized.
  * Simplified PR: dangling mass is not redistributed (rank sums < 1 —
  * the standard edge-list formulation; teleport keeps it bounded).
  *
  * Cross-engine determinism (SURVEY §4): per-edge contributions are
  * round(rank/od, 9) doubles cast to DECIMAL(28,9) and summed in
  * decimal — order-independent and exact; the damping multiply and
  * teleport add stay in decimal (0.85 is exact DECIMAL(3,2)), so the
  * rank after every iteration is bit-identical on any engine. Only the
  * final output rounds back to a double.
  */
object PageRank {

  /** (node, rank) after `iters` iterations over distinct directed
    * edges (src, dst). */
  def ranks(edges: DataFrame, iters: Int = 3,
            teleportN: Option[Long] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val od = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // Pregel/GraphX layout: out-degree is joined into the edge table
    // ONCE and the result cached hash-partitioned on src — every
    // iteration's rank join then reads the (large) edge side straight
    // from cache with matching partitioning and only shuffles the
    // node-sized rank vector. Without this the edge table re-shuffles
    // on src once per iteration, which at web-graph scale is the whole
    // cost of the loop.
    val eod = e.join(od, "src")
      .select(col("src"), col("dst"), col("od"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = eod.select(col("src").as("node"))
      .union(eod.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one scalar action (node count), same license as DedupCluster's
    // convergence aggregate — a single tiny agg, never a collect of rows
    val n = teleportN.getOrElse(nodes.count())
    val teleport = round(lit(0.15) / lit(n.toDouble), 9).cast("decimal(28,9)")
    var r = nodes.select(col("node"),
      round(lit(1.0) / lit(n.toDouble), 9).cast("decimal(28,9)").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = eod
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          round(col("rank").cast("double") / col("od").cast("double"), 9)
            .cast("decimal(28,9)").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).cast("decimal(27,9)").as("s"))
      // r18 (the DedupCluster loop rule, guide §3.3): truncate the
      // lineage each pass — without this iteration i's plan embeds and
      // re-optimizes iterations 1..i−1 (the 3-iteration plan measured
      // 122 KB of explain text, planning-bound). The rank vector is
      // node-sized exact decimals; values unchanged.
      r = nodes.join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (teleport + lit(0.85).cast("decimal(3,2)") *
            coalesce(col("s"), lit(0).cast("decimal(27,9)"))).as("rank"))
        .localCheckpoint(true)
    }
    r.select(col("node"), round(col("rank").cast("double"), 9).as("rank"))
  }
}
