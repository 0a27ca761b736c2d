package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Distributed dense-id assignment: label rows 0..n−1 in `orderCols`
  * order WITHOUT a single-partition global pass — the surrogate-key /
  * training-example-numbering primitive.
  *
  * `row_number()` over an unpartitioned window funnels the corpus
  * through one task; `monotonically_increasing_id` is sparse and
  * partition-dependent. The scalable idiom is the two-pass offset
  * trick: range-repartition on the order key (sampled boundaries — the
  * same machinery as a distributed sort, parallel at any scale), count
  * rows per partition (tiny job), prefix-sum the counts into per-
  * partition starting offsets (a partitions-sized array on the driver),
  * then a per-partition sequential stamp. Ids equal the global rank, so
  * they are deterministic whenever `orderCols` is a total order —
  * partition boundaries may move between runs, ranks cannot.
  *
  * The count job and the stamping job run over the SAME materialized
  * RDD instance — same ShuffleDependency, same sampled boundaries — so
  * they see identical partitioning by construction and the second job
  * reuses the first's shuffle map outputs. No persist(): nothing pinned
  * in the block store across calls.
  */
object DenseId {

  def assign(df: DataFrame, orderCols: Seq[String],
             idCol: String = "dense_id"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be a (total) ordering key")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val rdd = sorted.rdd
    // count in a Long accumulator — Iterator.size returns Int and would
    // silently overflow past 2^31 rows per partition, corrupting every
    // downstream id
    val counts = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var c = 0L
        while (it.hasNext) { it.next(); c += 1L }
        Iterator((i, c))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(counts.scanLeft(0L)(_ + _))
    val withId = rdd.mapPartitionsWithIndex { (i, it) =>
      var k = offsets.value(i)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ k); k += 1; out }
    }
    spark.createDataFrame(withId,
      sorted.schema.add(idCol, LongType, nullable = false))
  }
}
