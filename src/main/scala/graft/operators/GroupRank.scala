package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, count, floor, lit, max, when}
import org.apache.spark.sql.types.LongType

/** Distributed per-group rank / prefix-sum — the scale-safe replacement
  * for `row_number() OVER (PARTITION BY low_card_key ORDER BY ...)`.
  *
  * A window partitioned by a 3-value key funnels ~1/3 of the table into
  * ONE task's sort; correct at sf0.1, a scale-killer at 100 TB. The
  * scalable idiom generalizes [[DenseId]] per group: range-repartition
  * on (group ++ order) — sampled boundaries, the same machinery as a
  * distributed sort, parallel at any scale — sort within partitions,
  * then two passes over the SAME persisted partitioning:
  *
  *  1. per-partition, per-group weight totals (groups are contiguous
  *     runs inside a sorted partition, so this is a streaming fold; the
  *     result is at most `partitions + groups` rows — driver-sized by
  *     construction, NOT data-sized);
  *  2. driver prefix-sums each group's totals in partition order into
  *     (partition, group) → starting offset, broadcast, and a
  *     per-partition sequential stamp assigns the exact global
  *     within-group rank.
  *
  * Ranks equal the true per-group rank whenever (orderCols) is a total
  * order within the group — partition boundaries may move between runs,
  * ranks cannot. Weights accumulate in a Long `var` (never
  * `Iterator.size`, whose Int silently overflows past 2^31 rows).
  *
  * Both passes run over the SAME materialized RDD instance, i.e. the
  * same ShuffleDependency and the same RangePartitioner object — so
  * pass 2 sees identical partitioning by construction (boundaries are
  * sampled once, when the DAG materializes) and Spark reuses pass 1's
  * shuffle map outputs instead of recomputing the scan. No persist():
  * nothing is pinned in the block store, so repeated calls in a
  * long-lived session leak nothing; the shuffle files themselves are
  * reclaimed by the ContextCleaner when the RDD is garbage-collected.
  */
object GroupRank {

  /** The driver-offset tables below are per-(partition, group)-sized —
    * bounded-cardinality by design (deciles, arms, folds at every
    * current call site). Past this many entries the mechanism is the
    * wrong tool and the collect fails LOUDLY instead of risking a
    * silent driver OOM (the no-silent-degradation rule). */
  val MaxDriverEntries: Int = 1 << 20

  /** Adds `outCol` = EXCLUSIVE per-group prefix sum of `weightCol`
    * (Long; 1 per row when None) in `orderCols` order.
    * `maxDriverEntries` bounds the per-(partition, group) offset table
    * collected to the driver — raise it deliberately for a genuinely
    * larger bounded key, or use a window/two-phase aggregate for
    * high-cardinality groups. */
  def prefixSum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                weightCol: Option[String], outCol: String,
                maxDriverEntries: Int = MaxDriverEntries): DataFrame = {
    require(groupCols.nonEmpty && orderCols.nonEmpty,
      "groupCols and orderCols must be non-empty")
    val spark = df.sparkSession
    val keyCols = (groupCols ++ orderCols).map(col)
    val sorted = df.repartitionByRange(keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val wIdx = weightCol.map(sorted.schema.fieldIndex)
    val rdd = sorted.rdd

    // Pass 1: per-(partition, group) totals. Sorted input ⇒ groups are
    // contiguous, so one running Long per run suffices.
    val entriesRdd =
      rdd.mapPartitionsWithIndex { (pi, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, List[Any], Long)]
        var cur: List[Any] = null
        var run = 0L
        it.foreach { r =>
          val k = gIdx.map(r.get(_): Any).toList
          if (cur == null || k != cur) {
            if (cur != null) out += ((pi, cur, run))
            cur = k; run = 0L
          }
          run += wIdx.fold(1L)(i => r.getAs[Number](i).longValue())
        }
        if (cur != null) out += ((pi, cur, run))
        out.iterator
      }
    // Bound BEFORE materializing on the driver: count() keeps the
    // entries on the executors (one Long per partition comes back), so
    // a genuinely high-cardinality key trips the require instead of
    // OOMing inside the collect the guard exists to prevent. r18: the
    // entries are persisted across the count → collect pair so the
    // run-length pass streams the sorted shuffle ONCE (the recount
    // previously re-deserialized and re-folded every row, a second
    // full pass per prefixSum call); unpersisted before pass 2.
    entriesRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEntries = entriesRdd.count()
    require(nEntries <= maxDriverEntries,
      s"GroupRank.prefixSum would collect $nEntries " +
        s"per-(partition, group) offset entries to the driver (bound " +
        s"$maxDriverEntries): the group key's cardinality is too high " +
        "for the driver-offset mechanism — raise maxDriverEntries " +
        "deliberately, or rank high-cardinality groups with a window/" +
        "two-phase aggregate instead")
    val partGroupSums: Array[(Int, List[Any], Long)] = entriesRdd.collect()
    entriesRdd.unpersist(blocking = false)

    // Driver: prefix-sum each group's totals in partition order.
    val offsets: Map[(Int, List[Any]), Long] = partGroupSums
      .groupBy(_._2).iterator.flatMap { case (k, perPart) =>
        val inOrder = perPart.sortBy(_._1)
        inOrder.map(_._1).zip(inOrder.map(_._3).scanLeft(0L)(_ + _))
          .map { case (pi, off) => ((pi, k), off) }
      }.toMap
    val bc = spark.sparkContext.broadcast(offsets)

    // Pass 2: sequential stamp over the same partitions (shared
    // ShuffleDependency — the map stage is skipped, not recomputed).
    val stamped = rdd.mapPartitionsWithIndex { (pi, it) =>
      var cur: List[Any] = null
      var run = 0L
      it.map { r =>
        val k = gIdx.map(r.get(_): Any).toList
        if (cur == null || k != cur) {
          cur = k; run = bc.value.getOrElse((pi, k), 0L)
        }
        val out = Row.fromSeq(r.toSeq :+ run)
        run += wIdx.fold(1L)(i => r.getAs[Number](i).longValue())
        out
      }
    }
    spark.createDataFrame(stamped,
      sorted.schema.add(outCol, LongType, nullable = false))
  }

  /** Adds `outCol` = 1-based row_number within `groupCols`, ordered by
    * `orderCols` (which must totally order rows within each group). */
  def rowNumber(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                outCol: String): DataFrame =
    prefixSum(df, groupCols, orderCols, None, "__grp_excl")
      .withColumn(outCol, col("__grp_excl") + 1L).drop("__grp_excl")

  /** Adds `outCol` = the `ntile(k)` tile id (1..k) within each group —
    * Spark's window semantics exactly: the first n mod k tiles take
    * ceil(n/k) rows, the rest floor(n/k) — but computed from the
    * distributed rank plus a per-group-count join instead of a
    * per-group window sort. This is the scale path for the tile-id
    * half of q_ntile_frames' shape (SURVEY §5 caveat): when only the
    * tile label is needed (quantile bucketing, folds by rank band),
    * no single task ever sorts a whole group. */
  def ntile(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
            k: Int, outCol: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ranked = rowNumber(df, groupCols, orderCols, "__grp_rn")
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__grp_n"))
    val kL = k.toLong
    // Spark's ntile: bigger = n % k tiles of size n/k + 1 come first.
    // Column `/` is DOUBLE division — floor().cast(long) makes it the
    // integral div (exact below 2^53 rows per group, far past the Long
    // row counts anything here produces).
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor(a / b).cast("long")
    val n = col("__grp_n")
    val r0 = col("__grp_rn") - 1L // 0-based rank
    val small = idiv(n, lit(kL)) // floor tile size
    val bigger = n % kL // number of (small+1)-sized leading tiles
    val cut = bigger * (small + 1L) // rows covered by the big tiles
    val tile = when(n < kL, r0 + 1L) // fewer rows than tiles: one row per tile
      .otherwise(when(r0 < cut, idiv(r0, small + 1L) + 1L)
        .otherwise(bigger + idiv(r0 - cut, small) + 1L))
    ranked.join(counts, groupCols)
      .withColumn(outCol, tile)
      .drop("__grp_rn", "__grp_n")
  }

  /** Multi-dimension ntile in ONE range shuffle: stacks the dimensions
    * as (dim-id, value, id) rows, ranks them all with a single
    * range-repartition keyed (dim-id, value, id...) — each dimension is
    * its own contiguous key range, so this is one sort of d·n rows, not
    * d sorts of n — then pivots the tile ids back to one row per id.
    * The scale win over chaining `ntile` d times: one Exchange instead
    * of d, and the pivot is a plain hash agg. Values are compared as
    * decimal(38,9) (order-preserving for ints/longs/decimals ≤ 29
    * integer digits); ties break on `idCols`, matching
    * `ntile(df, g, Seq(dim) ++ idCols, ...)` exactly.
    *
    * PRECONDITION: `idCols` must uniquely key `df`. With duplicate id
    * rows the final pivot (max over `__tile` per id) would collapse
    * them to one row carrying the max tile — silently diverging from
    * d chained `ntile` calls, which keep every row. GroupRankSpec
    * asserts this contract.
    *
    * Returns `idCols` plus one tile column (1..k) per dimension —
    * join back to the source if other columns are needed (a join on
    * the unique `idCols` key cannot fan out). */
  def ntileMany(df: DataFrame, idCols: Seq[String],
                dims: Seq[(String, String)], k: Int): DataFrame = {
    require(dims.nonEmpty, "dims must be non-empty")
    val melted = dims.zipWithIndex.map { case ((orderCol, _), i) =>
      df.select((idCols.map(col) :+ lit(i).as("__dim") :+
        col(orderCol).cast("decimal(38,9)").as("__v")): _*)
    }.reduce(_.unionAll(_))
    val tiled = ntile(melted, Seq("__dim"), "__v" +: idCols, k, "__tile")
    val aggCols = dims.zipWithIndex.map { case ((_, outCol), i) =>
      max(when(col("__dim") === i, col("__tile"))).as(outCol)
    }
    tiled.groupBy(idCols.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }
}
