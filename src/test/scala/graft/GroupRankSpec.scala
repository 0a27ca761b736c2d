package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GroupRank

/** GroupRank = the distributed replacement for per-group window ranks.
  * Parity is asserted against the window-function answer (correct by
  * definition at test scale), plus the two properties the operator
  * exists for: a rangepartitioning exchange in its internal plan (the
  * distributed sort), and rank determinism across input partitionings. */
class GroupRankSpec extends SparkSpec {

  private def mkDf(parts: Int) = {
    val s = spark
    import s.implicits._
    // 3 skewed groups, heavy ties in v — the window-killer shape
    (1 to 5000).map { i =>
      val g = if (i % 10 < 7) "a" else if (i % 10 < 9) "b" else "c"
      (g, (i * 2654435761L % 50).toInt, i)
    }.toDF("g", "v", "id").repartition(parts)
  }

  test("rowNumber matches row_number() OVER (PARTITION BY g ORDER BY v, id)") {
    val df = mkDf(7)
    val got = GroupRank.rowNumber(df, Seq("g"), Seq("v", "id"), "i")
      .select("g", "v", "id", "i")
    val want = df.withColumn("i",
      row_number().over(Window.partitionBy("g").orderBy("v", "id")).cast("long"))
      .select("g", "v", "id", "i")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("prefixSum refuses a high-cardinality group key loudly " +
      "(driver-offset bound)") {
    // the driver offset table is per-(partition, group)-sized — a key
    // with more groups than the bound must fail with the mechanism
    // named, never creep toward a driver OOM
    val df = mkDf(4)
    val e = intercept[IllegalArgumentException] {
      GroupRank.prefixSum(df, Seq("id"), Seq("v"), None, "s",
        maxDriverEntries = 16)
    }
    assert(e.getMessage.contains("maxDriverEntries") &&
      e.getMessage.contains("cardinality"))
    // the same call under the default bound succeeds (5000 ids)
    assert(GroupRank.prefixSum(df, Seq("id"), Seq("v"), None, "s")
      .count() === 5000L)
  }

  test("prefixSum matches the exclusive running sum per group") {
    val df = mkDf(5).groupBy("g", "v").agg(count(lit(1)).as("c"))
    val got = GroupRank.prefixSum(df, Seq("g"), Seq("v"), Some("c"), "smaller")
      .select("g", "v", "smaller")
    val want = df.withColumn("smaller",
      coalesce(sum("c").over(Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("g", "v", "smaller")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("ranks are deterministic across input partitionings") {
    val a = GroupRank.rowNumber(mkDf(3), Seq("g"), Seq("v", "id"), "i")
    val b = GroupRank.rowNumber(mkDf(13), Seq("g"), Seq("v", "id"), "i")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("ntile matches Spark's window ntile for dividing and non-dividing k") {
    val df = mkDf(6)
    for (k <- Seq(4, 7, 10000)) { // 10000 > any group size: one row per tile
      val got = GroupRank.ntile(df, Seq("g"), Seq("v", "id"), k, "t")
        .select("g", "v", "id", "t")
      val want = df.withColumn("t",
        ntile(k).over(Window.partitionBy("g").orderBy("v", "id")).cast("long"))
        .select("g", "v", "id", "t")
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"k=$k")
    }
  }

  test("internal plan range-repartitions (distributed sort, no global funnel)") {
    val df = mkDf(4)
    val internal = df.repartitionByRange(col("g"), col("v"), col("id"))
      .sortWithinPartitions(col("g"), col("v"), col("id"))
    val p = internal.queryExecution.executedPlan.toString
    assert(p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    // and the operator spreads rows: no partition holds a whole group.
    // (AQE rightly coalesces a 60-row frame to one partition — disable
    // that small-data optimization so the assert sees the scale shape.)
    val spark = SparkSpec.spark
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val ranked = GroupRank.rowNumber(df, Seq("g"), Seq("v", "id"), "i")
      assert(ranked.rdd.getNumPartitions > 1)
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("ntileMany matches d chained ntile calls in one range shuffle") {
    val s = spark
    import s.implicits._
    // three dimensions with different orders + ties — the RFM shape
    val df = (1 to 600).map { i =>
      (i.toLong, (i * 2654435761L % 40).toInt, (i * 40503L % 17).toInt,
        (i * 97L % 1000).toInt)
    }.toDF("id", "a", "b", "c")
    val fused = GroupRank.ntileMany(df, Seq("id"),
      Seq("a" -> "ta", "b" -> "tb", "c" -> "tc"), 5)
      .select("id", "ta", "tb", "tc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val g = df.withColumn("g", lit(1))
    val chained = GroupRank.ntile(
      GroupRank.ntile(
        GroupRank.ntile(g, Seq("g"), Seq("a", "id"), 5, "ta"),
        Seq("g"), Seq("b", "id"), 5, "tb"),
      Seq("g"), Seq("c", "id"), 5, "tc")
      .select("id", "ta", "tb", "tc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fused === chained)
  }

  test("ntileMany precondition: idCols must uniquely key df (duplicates collapse)") {
    val s = spark
    import s.implicits._
    // Documents the stated contract: with a DUPLICATE id, the pivot
    // collapses the two rows to one carrying the max tile — unlike
    // chained ntile, which would keep both rows. Callers must pass a
    // unique key; this pins the observable behavior if they don't.
    val dup = Seq((1L, 10), (1L, 990), (2L, 500), (3L, 700))
      .toDF("id", "a")
    val out = GroupRank.ntileMany(dup, Seq("id"), Seq("a" -> "ta"), 2)
    assert(out.count() === 3, "duplicate ids collapse to one output row")
    val t1 = out.filter($"id" === 1L).select("ta").as[Long].head()
    assert(t1 === 2L, "collapsed row carries the MAX tile of the duplicates")
  }

  test("no cached blocks survive a prefixSum/ntile/q_spearman/q_gini run") {
    val sc = SparkSpec.spark.sparkContext
    // The context is shared with concurrently-running suites, so the
    // global persistent-RDD COUNT can move in either direction during
    // this test (another suite persisting or unpersisting mid-window).
    // Assert only on ids CREATED during this test's window: any id
    // absent before and present after is a leak attributable to us —
    // immune to concurrent unpersists of pre-existing ids.
    def persistedIds = sc.getPersistentRDDs.keySet
    val before = persistedIds
    GroupRank.prefixSum(mkDf(5), Seq("g"), Seq("v", "id"), None, "ps").count()
    GroupRank.ntile(mkDf(5), Seq("g"), Seq("v", "id"), 4, "t").count()
    SparkEntry.queries("q_spearman")(SparkSpec.spark, sf).count()
    SparkEntry.queries("q_gini")(SparkSpec.spark, sf).count()
    // the two-pass operators own no cache: consuming their outputs must
    // not leave behind any NEW cached RDD. A concurrent suite's
    // TRANSIENT persist (created during our window, unpersisted when
    // that suite's loan scope exits) can be alive at snapshot time; a
    // genuine leak from this test never clears, so poll briefly before
    // declaring one.
    def leaked = persistedIds.diff(before)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    assert(leaked.isEmpty, s"leaked cached RDD ids: ${leaked.mkString(",")}")
  }
}
