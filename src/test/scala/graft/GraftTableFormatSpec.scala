package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The `graft-table` SQL/DataFrame surface over [[VersionedTable]]:
  * format() reads with versionAsOf/timestampAsOf, save-mode writes,
  * and — the engine-side contract — manifest-stats FILE PRUNING on
  * the read path: a point lookup on a clustered table must PLAN only
  * the files whose key ranges can match, the dual of merge's
  * `pruneCandidateFiles` (r17 verdict item 1/2). */
class GraftTableFormatSpec extends SparkSpec {

  private val ss = SparkSpec.spark
  import ss.implicits._

  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other =>
      other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
  }

  /** Files the executed plan's scan READ (post-FileIndex pruning).
    * Executes the frame EXACTLY ONCE — the numFiles driver metric is
    * posted when the scan's partition list is first resolved, so a
    * re-executed plan (cached lazy partitions) reports nothing. */
  private def filesPlanned(df: DataFrame)
      : (Long, Seq[org.apache.spark.sql.Row]) = {
    val rows = df.collect().toSeq
    val sc = scans(df.queryExecution.executedPlan)
    assert(sc.nonEmpty, "expected a file scan")
    (sc.map(_.metrics("numFiles").value).max, rows)
  }

  private def mkVersions(p: String): Unit = {
    VersionedTable.init(ss, p,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("key", "tag", "bal"))
    Thread.sleep(5) // commit timestamps must be distinguishable (versionAt)
    VersionedTable.merge(ss, p,
      Seq((1L, "a2", 11.0, "U"), (3L, "c", 0.0, "D"), (5L, "e", 50.0, "U"))
        .toDF("key", "tag", "bal", "op"),
      Seq("key"), deleteWhen = col("op") === "D")
    Thread.sleep(5)
    VersionedTable.merge(ss, p,
      Seq((7L, "g", 70.0)).toDF("key", "tag", "bal"), Seq("key"))
  }

  test("format(graft-table): current + versionAsOf reads match the " +
      "Scala API version-for-version") {
    val p = s"${tmpDir("gtf")}/t"
    mkVersions(p)
    def viaFormat(v: Option[Long]) = {
      val r = ss.read.format("graft-table")
      v.fold(r)(n => r.option("versionAsOf", n.toString)).load(p)
    }
    for (v <- Seq(Some(1L), Some(2L), Some(3L), None)) {
      val api = VersionedTable.read(ss, p, v)
      val fmt = viaFormat(v)
      assert(fmt.schema === api.schema)
      assert(fmt.except(api).isEmpty && api.except(fmt).isEmpty,
        s"format read of version $v differs from the API read")
    }
    assert(viaFormat(Some(2L)).count() === 3L)
  }

  test("format(graft-table): timestampAsOf resolves the newest commit " +
      "at or before the timestamp") {
    val p = s"${tmpDir("gtf")}/t"
    mkVersions(p)
    // commit timestamps from the manifests themselves (describeHistory)
    val hist = VersionedTable.describeHistory(ss, p)
      .select("version", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val atV2 = new java.sql.Timestamp(hist(2L).getTime).toString
    val got = ss.read.format("graft-table")
      .option("timestampAsOf", atV2).load(p)
    val want = VersionedTable.read(ss, p, Some(2L))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // before the first commit: loud error naming the mechanism
    val e = intercept[IllegalArgumentException] {
      ss.read.format("graft-table")
        .option("timestampAsOf", "1999-01-01 00:00:00").load(p).collect()
    }
    assert(e.getMessage.contains("no version"))
  }

  test("a filtered read PLANS only the stats-matching files — point " +
      "lookups on a clustered table scan ~1 file, not the manifest") {
    val p = s"${tmpDir("gtf")}/t"
    val big = ss.range(0L, 4000L).select(col("id").as("key"),
      concat(lit("t"), col("id")).as("tag"),
      col("id").cast("double").as("bal"))
    VersionedTable.init(ss, p, big, clusterBy = Seq("key"), numFiles = 8)
    val total = VersionedTable.files(p).size
    assert(total >= 6, s"clustered init lays out ~8 files, got $total")
    // ground truth from the manifest stats: files whose range holds 11
    val m = VersionedTable.readManifest(p, 1L)
    val candidates = m.files.count(_.stats.get("key").exists { case (mn, mx) =>
      mn.toLong <= 11L && 11L <= mx.toLong })
    assert(candidates <= 2, s"key 11 should sit in ≤2 files' ranges")
    // the format surface prunes...
    val (fmtFiles, fmtRows) = filesPlanned(
      ss.read.format("graft-table").load(p).filter(col("key") === 11L))
    assert(fmtRows.map(_.getAs[String]("tag")) === Seq("t11"))
    assert(fmtFiles === candidates.toLong,
      "format read must plan exactly the stats-candidate files")
    // ...and the Scala read() API prunes identically (shared FileIndex)
    val (apiFiles, apiRows) = filesPlanned(
      VersionedTable.read(ss, p).filter(col("key") === 11L))
    assert(apiRows.size === 1)
    assert(apiFiles === candidates.toLong,
      "read() must plan exactly the stats-candidate files")
    // range + IN predicates prune too; an unprunable predicate keeps
    // all files but stays correct
    assert(filesPlanned(VersionedTable.read(ss, p)
      .filter(col("key") >= 3990L))._1 <= 2L)
    assert(filesPlanned(VersionedTable.read(ss, p)
      .filter(col("key").isin(1L, 2L, 3L)))._1 <= 2L)
    val (allFiles, modRows) = filesPlanned(
      VersionedTable.read(ss, p).filter(col("key") % 1000L === 1L))
    assert(modRows.size === 4)
    assert(allFiles === total.toLong,
      "non-interval predicates conservatively keep every file")
    // a no-match point still PRUNES to the one covering range file
    assert(VersionedTable.read(ss, p).filter(col("tag") === "nope")
      .count() === 0L, "unstatted/unmatched filters stay correct")
  }

  test("parquet footer pushdown still rides below the manifest pruning") {
    val p = s"${tmpDir("gtf")}/t"
    VersionedTable.init(ss, p,
      ss.range(0L, 1000L).select(col("id").as("key"),
        col("id").cast("double").as("bal")),
      clusterBy = Seq("key"), numFiles = 4)
    val df = VersionedTable.read(ss, p).filter(col("key") === 500L)
    df.collect()
    val scan = scans(df.queryExecution.executedPlan).head
    val meta = scan.metadata.get("PushedFilters").getOrElse("")
    assert(meta.contains("key"),
      s"expected the key predicate pushed to parquet, got: $meta")
  }

  test("readChangeFeed: the I/U/D feed rides the format surface and " +
      "matches the API change feed") {
    val p = s"${tmpDir("gtf")}/t"
    mkVersions(p)
    val feed = ss.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("endingVersion", "2").option("changeKeys", "key").load(p)
    val got = feed.collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Long]("key"))).toSet
    assert(got === Set(("U", 1L), ("D", 3L), ("I", 5L)))
    // endingVersion defaults to current; the composed 1 -> 3 feed
    // carries v3's insert alongside v2's changes
    val toCur = ss.read.format("graft-table")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("changeKeys", "key").load(p)
    val composed = toCur.collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Long]("key"))).toSet
    assert(composed === Set(("U", 1L), ("D", 3L), ("I", 5L), ("I", 7L)))
    // missing options refuse loudly
    val e = intercept[IllegalArgumentException] {
      ss.read.format("graft-table")
        .option("readChangeFeed", "true").load(p)
    }
    assert(e.getMessage.contains("startingVersion"))
  }

  test("SQL interface: a loaded version registers as a temp view and " +
      "time-travel queries run in pure SQL") {
    val p = s"${tmpDir("gtf")}/t"
    mkVersions(p)
    ss.read.format("graft-table").option("versionAsOf", "1").load(p)
      .createOrReplaceTempView("gtf_v1")
    ss.read.format("graft-table").load(p)
      .createOrReplaceTempView("gtf_cur")
    val got = ss.sql(
      """SELECT c.key, v1.tag AS was, c.tag AS now
        |FROM gtf_cur c JOIN gtf_v1 v1 ON c.key = v1.key
        |ORDER BY c.key""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1L, "a", "a2"), (2L, "b", "b")))
  }

  test("write surface: save modes map to init / overwrite / MERGE") {
    val p = s"${tmpDir("gtf")}/t"
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("key", "tag", "bal")
    base.write.format("graft-table").option("clusterBy", "key").save(p)
    assert(VersionedTable.currentVersion(p) === Some(1L))
    // default mode is ErrorIfExists: double-create refuses
    intercept[Exception] { base.write.format("graft-table").save(p) }
    // append = MERGE on declared keys
    Seq((1L, "a2", 11.0), (3L, "c", 30.0)).toDF("key", "tag", "bal")
      .write.format("graft-table").mode("append")
      .option("mergeKeys", "key").save(p)
    assert(VersionedTable.currentVersion(p) === Some(2L))
    val got = VersionedTable.read(ss, p).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got === Map(1L -> (("a2", 11.0)), 2L -> (("b", 20.0)),
      3L -> (("c", 30.0))))
    // append without keys refuses loudly
    val e = intercept[Exception] {
      base.write.format("graft-table").mode("append").save(p)
    }
    assert(e.getMessage.contains("mergeKeys"))
    // overwrite = full replace as a NEW version; history survives
    Seq((9L, "z", 90.0)).toDF("key", "tag", "bal")
      .write.format("graft-table").mode("overwrite").save(p)
    assert(VersionedTable.currentVersion(p) === Some(3L))
    assert(VersionedTable.read(ss, p).count() === 1L)
    assert(VersionedTable.read(ss, p, Some(2L)).count() === 3L)
  }
}
