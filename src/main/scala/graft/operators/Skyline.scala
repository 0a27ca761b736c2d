package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed GLOBAL Pareto frontier (skyline) over two dimensions —
  * minimize `xCol`, maximize `yCol`. The per-group SQL formulation
  * (q_pareto) needs one sort per group; a global frontier sorted on one
  * key would funnel the corpus through a single window partition, so
  * this runs the scalable two-stage plan instead:
  *
  *  1. range-repartition on (x asc, y desc, tie...) — the same sampled
  *     boundary machinery as a distributed sort, so partition i's keys
  *     all precede partition i+1's in frontier order (the composite
  *     key keeps equal-x ties ordered y-desc ACROSS the boundary too,
  *     which a plain x-range split would not guarantee) — then filter
  *     each partition by its local running max of y;
  *  2. per-partition y-maxima (one tiny P-sized collect) prefix-max on
  *     the driver; a stage-1 survivor in partition p is global iff its
  *     y beats the max of all earlier partitions.
  *
  * Survivors of both stages are exactly the rows the sequential
  * running-max pass over the fully-sorted data would keep: weak
  * dominance, keep-first on duplicate (x, y) points.
  */
object Skyline {

  /** `maxDriverEntries` bounds the per-partition maxima array collected
    * to the driver (one Double per partition — the bound exists so a
    * pathological million-partition input fails with the mechanism
    * named instead of creeping toward a driver OOM). */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 tieCols: Seq[String],
                 maxDriverEntries: Int = GroupRank.MaxDriverEntries)
      : DataFrame = {
    val spark = df.sparkSession
    val orderCols: Seq[Column] =
      col(xCol).asc +: col(yCol).desc +: tieCols.map(col(_).asc)
    // Both stages run off the same materialized RDD (one
    // ShuffleDependency): identical partitioning by construction, map
    // outputs reused across the jobs, nothing pinned in the block store.
    val sorted = df
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema
    val yIdx = schema.fieldIndex(yCol)
    def yOf(r: Row): Double = r.getAs[Any](yIdx) match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric y: $other")
    }
    // stage 1: local running-max filter + this partition's max y
    val rdd = sorted.rdd
    // The driver array is exactly one Double per partition, and the
    // partition count is known driver-side WITHOUT running a job —
    // bound before anything materializes (a post-collect require could
    // only rename the OOM it was meant to prevent).
    require(rdd.getNumPartitions <= maxDriverEntries,
      s"Skyline.frontier2d would collect ${rdd.getNumPartitions} " +
        s"per-partition maxima to the driver (bound $maxDriverEntries): " +
        "repartition the input to fewer partitions, or raise " +
        "maxDriverEntries deliberately")
    val survivors = rdd.mapPartitionsWithIndex { (pid, it) =>
      var best = Double.NegativeInfinity
      it.flatMap { r =>
        val y = yOf(r)
        if (y > best) { best = y; Some((pid, r)) } else None
      }
    }
    val maxima = rdd.mapPartitionsWithIndex { (pid, it) =>
      var best = Double.NegativeInfinity
      it.foreach(r => { val y = yOf(r); if (y > best) best = y })
      Iterator((pid, best))
    }.collect().sortBy(_._1).map(_._2)
    // prefixMax(p) = max y over all partitions strictly before p
    val prefix = maxima.scanLeft(Double.NegativeInfinity)(math.max).dropRight(1)
    val bc = spark.sparkContext.broadcast(prefix)
    val global = survivors.filter { case (pid, r) => yOf(r) > bc.value(pid) }
      .map(_._2)
    spark.createDataFrame(global, schema)
  }
}
