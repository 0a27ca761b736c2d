package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Snapshot time travel + retention on the MERGE sink: immutable
  * versions, pinned readers surviving concurrent merges/vacuums, and
  * retention that keeps K + pins (the round-15 verdict's contract). */
class VersionedTableSpec extends SparkSpec {

  private val ss = SparkSpec.spark
  import ss.implicits._

  private def state(path: String, asOf: Option[Long] = None) =
    VersionedTable.read(ss, path, asOf).collect()
      .map(r => r.getAs[Long]("key") ->
        ((r.getAs[String]("tag"), r.getAs[Double]("bal")))).toMap

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("key", "tag", "bal")

  test("read-at-version parity across two merges") {
    val p = s"${tmpDir("vt")}/t"
    assert(VersionedTable.init(ss, p, base) === 1L)
    // v2: update 1, delete 3, insert 5
    val d1 = Seq((1L, "a2", 11.0, "U"), (3L, "c", 0.0, "D"),
      (5L, "e", 50.0, "U")).toDF("key", "tag", "bal", "op")
    assert(VersionedTable.merge(ss, p, d1, Seq("key"),
      deleteWhen = col("op") === "D") === 2L)
    // v3: delete 5, insert 7
    val d2 = Seq((5L, "e", 0.0, "D"), (7L, "g", 70.0, "U"))
      .toDF("key", "tag", "bal", "op")
    assert(VersionedTable.merge(ss, p, d2, Seq("key"),
      deleteWhen = col("op") === "D") === 3L)
    // every version stays readable, each with its own state
    assert(state(p, Some(1L)) === Map(1L -> (("a", 10.0)),
      2L -> (("b", 20.0)), 3L -> (("c", 30.0))))
    assert(state(p, Some(2L)) === Map(1L -> (("a2", 11.0)),
      2L -> (("b", 20.0)), 5L -> (("e", 50.0))))
    assert(state(p, Some(3L)) === Map(1L -> (("a2", 11.0)),
      2L -> (("b", 20.0)), 7L -> (("g", 70.0))))
    // latest == v3; op marker never lands in the table
    assert(state(p) === state(p, Some(3L)))
    assert(VersionedTable.read(ss, p).columns.sorted.toSeq ===
      Seq("bal", "key", "tag"))
    assert(VersionedTable.versions(p) === Seq(1L, 2L, 3L))
    // asking for a never-committed version names the mechanism
    val e = intercept[IllegalStateException] {
      VersionedTable.read(ss, p, Some(9L))
    }
    assert(e.getMessage.contains("not available"))
  }

  test("a reader's plan survives concurrent merges (immutable snapshots)") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base)
    // resolve the plan FIRST (the concurrent reader), merge AFTER,
    // materialize LAST — the snapshot dir it scans is never touched
    val pinnedPlan = VersionedTable.read(ss, p, Some(1L))
    val d = Seq((2L, "b9", 99.0, "U")).toDF("key", "tag", "bal", "op")
    VersionedTable.merge(ss, p, d, Seq("key"))
    VersionedTable.merge(ss, p,
      Seq((1L, "a", 0.0, "D")).toDF("key", "tag", "bal", "op"),
      Seq("key"), deleteWhen = col("op") === "D")
    val got = pinnedPlan.collect().map(_.getAs[Long]("key")).sorted.toSeq
    assert(got === Seq(1L, 2L, 3L), "v1 content unchanged under merges")
    assert(state(p).keySet === Set(2L, 3L))
  }

  test("vacuum keeps K newest + pins; pinned reader survives vacuum") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base) // v1
    val pinId = VersionedTable.pin(p) // pin v1
    for (i <- 1 to 3) // v2..v4
      VersionedTable.merge(ss, p,
        Seq((10L + i, s"t$i", i.toDouble, "U")).toDF("key", "tag", "bal", "op"),
        Seq("key"))
    assert(VersionedTable.versions(p) === Seq(1L, 2L, 3L, 4L))
    // keep=2 → {3,4} plus pinned 1; only 2 is vacuumed
    assert(VersionedTable.vacuum(p, keep = 2) === Seq(2L))
    assert(VersionedTable.versions(p) === Seq(1L, 3L, 4L))
    // the pinned version still reads in full
    assert(state(p, Some(1L)).keySet === Set(1L, 2L, 3L))
    // a vacuumed version reads as a clean error, not a half-dir scan
    val e = intercept[IllegalStateException] {
      VersionedTable.read(ss, p, Some(2L))
    }
    assert(e.getMessage.contains("vacuumed") ||
      e.getMessage.contains("not available"))
    // release the pin: the next vacuum reclaims v1 (and keeps current)
    VersionedTable.unpin(p, pinId)
    assert(VersionedTable.vacuum(p, keep = 1).toSet === Set(1L, 3L))
    assert(VersionedTable.versions(p) === Seq(4L))
    assert(state(p).keySet === Set(1L, 2L, 3L, 11L, 12L, 13L))
    // manifest-reachability GC: every data file on disk is referenced
    // by the one remaining manifest; vacuumed-only files are gone
    val curFiles = VersionedTable.files(p).toSet
    val dd = new java.io.File(p, "data")
    val onDisk = Option(dd.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => s"data/${d.getName}/${f.getName}")).toSet
    assert(onDisk === curFiles,
      "disk holds exactly the files reachable from kept manifests")
  }

  test("readChanges: classified change feed; applying it replays the version") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base) // v1: 1,2,3
    val d1 = Seq((1L, "a2", 11.0, "U"), (3L, "c", 0.0, "D"),
      (5L, "e", 50.0, "U")).toDF("key", "tag", "bal", "op")
    VersionedTable.merge(ss, p, d1, Seq("key"),
      deleteWhen = col("op") === "D") // v2: 1',2,5
    val d2 = Seq((5L, "e", 0.0, "D"), (7L, "g", 70.0, "U"))
      .toDF("key", "tag", "bal", "op")
    VersionedTable.merge(ss, p, d2, Seq("key"),
      deleteWhen = col("op") === "D") // v3: 1',2,7
    def feed(a: Long, b: Long) =
      VersionedTable.readChanges(ss, p, a, b, Seq("key")).collect()
        .map(r => (r.getString(0), r.getLong(1),
          Option(r.getAs[String]("tag")))).toSet
    // v1 -> v2: update 1, delete 3, insert 5; key 2 never appears
    assert(feed(1L, 2L) === Set(("U", 1L, Some("a2")), ("D", 3L, None),
      ("I", 5L, Some("e"))))
    // v1 -> v3 composes: 5's insert+delete cancels OUT of the feed
    assert(feed(1L, 3L) === Set(("U", 1L, Some("a2")), ("D", 3L, None),
      ("I", 7L, Some("g"))))
    // delete rows carry null payload (the change-feed convention)
    val del = VersionedTable.readChanges(ss, p, 1L, 2L, Seq("key"))
      .filter(col("op") === "D").collect().head
    assert(del.isNullAt(del.fieldIndex("tag")) &&
      del.isNullAt(del.fieldIndex("bal")))
    // round trip: v1 copy + feed(1 -> 3) merged = v3 content exactly
    val p2 = s"${tmpDir("vt")}/replay"
    VersionedTable.init(ss, p2, VersionedTable.read(ss, p, Some(1L)))
    VersionedTable.merge(ss, p2,
      VersionedTable.readChanges(ss, p, 1L, 3L, Seq("key")),
      Seq("key"), deleteWhen = col("op") === "D")
    val replayed = VersionedTable.read(ss, p2).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("tag"),
        r.getAs[Double]("bal"))).toSet
    val v3 = VersionedTable.read(ss, p, Some(3L)).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("tag"),
        r.getAs[Double]("bal"))).toSet
    assert(replayed === v3, "merge(feed) must reproduce the target version")
    // bad bounds fail loudly
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readChanges(ss, p, 3L, 1L, Seq("key"))
    }
    assert(e.getMessage.contains("fromV < toV"))
  }

  test("relay: checkpointed incremental propagation keeps a downstream " +
      "table content-equal; replay after a torn checkpoint is a fixpoint") {
    val root = tmpDir("vt")
    val src = s"$root/src"; val dst = s"$root/dst"
    val ckpt = s"$root/relay.json"
    def content(p: String) = VersionedTable.read(ss, p).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("tag"),
        r.getAs[Double]("bal"))).toSet
    VersionedTable.init(ss, src, base) // src v1
    // bootstrap relay: dst inits from the full snapshot
    assert(VersionedTable.relayInto(ss, src, dst, Seq("key"), ckpt)
      === Some(1L))
    assert(content(dst) === content(src))
    // caught up: no work, no new destination version
    assert(VersionedTable.relayInto(ss, src, dst, Seq("key"), ckpt) === None)
    assert(VersionedTable.versions(dst) === Seq(1L))
    // two source merges, ONE relay: the feed composes (5's insert+
    // delete cancels) and dst lands content-equal in one hop
    VersionedTable.merge(ss, src,
      Seq((1L, "a2", 11.0, "U"), (3L, "c", 0.0, "D"), (5L, "e", 50.0, "U"))
        .toDF("key", "tag", "bal", "op"),
      Seq("key"), deleteWhen = col("op") === "D") // src v2
    VersionedTable.merge(ss, src,
      Seq((5L, "e", 0.0, "D"), (7L, "g", 70.0, "U"))
        .toDF("key", "tag", "bal", "op"),
      Seq("key"), deleteWhen = col("op") === "D") // src v3
    assert(VersionedTable.relayInto(ss, src, dst, Seq("key"), ckpt)
      === Some(2L))
    assert(content(dst) === content(src))
    // torn checkpoint (crash between apply and advance): rewind the
    // checkpoint and relay again — the same feed re-merges to the same
    // content (at-least-once is exactly-once in effect)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(ckpt), """{"version":1}""")
    assert(VersionedTable.relayInto(ss, src, dst, Seq("key"), ckpt)
      === Some(3L))
    assert(content(dst) === content(src), "replayed feed is a fixpoint")
    // a relay that fell behind a vacuum fails loudly, never partial
    VersionedTable.merge(ss, src,
      Seq((9L, "i", 90.0, "U")).toDF("key", "tag", "bal", "op"),
      Seq("key")) // src v4
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(ckpt), """{"version":1}""")
    VersionedTable.vacuum(src, keep = 1) // drops v1..v3
    val e = intercept[IllegalStateException] {
      VersionedTable.relayInto(ss, src, dst, Seq("key"), ckpt)
    }
    assert(e.getMessage.contains("not available") ||
      e.getMessage.contains("vacuumed"))
  }

  test("bucketed CDC relay: downstream stays content-equal AND " +
      "join-optimal (zero-Exchange SMJ on the merge key)") {
    val root = tmpDir("vtb")
    val src = s"$root/src"; val ckpt = s"$root/relay.json"
    val tbl = "vt_relay_bkt"; val dim = "vt_relay_dim"
    ss.sql(s"DROP TABLE IF EXISTS `$tbl`")
    ss.sql(s"DROP TABLE IF EXISTS `$dim`")
    def content(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("tag"),
        r.getAs[Double]("bal"))).toSet
    VersionedTable.init(ss, src, base, clusterBy = Seq("key"))
    // bootstrap relays the full snapshot into the bucketed layout
    assert(VersionedTable.relayIntoBucketed(ss, src, tbl, Seq("key"),
      4, ckpt) === Some((0L, 1L)))
    assert(content(ss.table(tbl)) === content(VersionedTable.read(ss, src)))
    // two source merges, ONE relay hop: the feed composes and the
    // bucketed downstream lands content-equal
    VersionedTable.merge(ss, src,
      Seq((1L, "a2", 11.0, "U"), (3L, "c", 0.0, "D"), (5L, "e", 50.0, "U"))
        .toDF("key", "tag", "bal", "op"),
      Seq("key"), deleteWhen = col("op") === "D")
    VersionedTable.merge(ss, src,
      Seq((5L, "e", 0.0, "D"), (7L, "g", 70.0, "U"))
        .toDF("key", "tag", "bal", "op"),
      Seq("key"), deleteWhen = col("op") === "D")
    assert(VersionedTable.relayIntoBucketed(ss, src, tbl, Seq("key"),
      4, ckpt) === Some((1L, 3L)))
    assert(content(ss.table(tbl)) === content(VersionedTable.read(ss, src)))
    // caught up: no work
    assert(VersionedTable.relayIntoBucketed(ss, src, tbl, Seq("key"),
      4, ckpt) === None)
    // the relay-maintained table is join-optimal: an SMJ against a
    // compatibly-bucketed dim plans with ZERO Exchange on either side
    graft.sources.Sinks.bucketed(
      base.select(col("key"), col("tag").as("t2")), dim, "key", 4, Seq("key"))
    val joined = ss.table(tbl).hint("merge")
      .join(ss.table(dim), "key")
    assert(joined.count() > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"relayed bucketed table still shuffles:\n$plan")
    ss.sql(s"DROP TABLE IF EXISTS `$tbl`")
    ss.sql(s"DROP TABLE IF EXISTS `$dim`")
  }

  test("withPinned loan: pin held during use, released after") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base)
    VersionedTable.merge(ss, p,
      Seq((4L, "d", 40.0, "U")).toDF("key", "tag", "bal", "op"), Seq("key"))
    val n = VersionedTable.withPinned(ss, p) { df =>
      // vacuum inside the loan: the pinned current (v2) must survive
      VersionedTable.vacuum(p, keep = 1)
      df.count()
    }
    assert(n === 4L)
    // after the loan the pin is gone
    val pins = new java.io.File(s"$p/_pins").listFiles()
    assert(pins == null || pins.isEmpty)
  }

  test("unreferenced staging debris is age-gated vacuumed; init guards") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base)
    VersionedTable.merge(ss, p,
      Seq((4L, "d", 40.0, "U")).toDF("key", "tag", "bal", "op"), Seq("key"))
    // fake a crashed writer: a staged data dir referenced by NO manifest
    val orphan = new java.io.File(p, "data/0000dead-beef-0000-0000-000000000000")
    base.write.parquet(orphan.getPath)
    assert(orphan.exists())
    // younger than the grace period: vacuum must NOT sweep it — it is
    // indistinguishable from an in-flight writer's staging
    VersionedTable.vacuum(p, keep = 1)
    assert(orphan.exists(), "fresh staging is never swept (could be in flight)")
    // age it past the grace: now it is crash debris
    def age(f: java.io.File): Unit = {
      f.setLastModified(1000L)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(age)
    }
    age(orphan)
    VersionedTable.vacuum(p, keep = 1)
    assert(!orphan.exists(), "unpublished staging older than the grace is debris")
    assert(state(p).keySet === Set(1L, 2L, 3L, 4L))
    // double-init fails loudly
    val e = intercept[IllegalArgumentException] {
      VersionedTable.init(ss, p, base)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("merge commits are O(delta): a small merge rewrites only the " +
      "files whose key ranges it touches and shares the rest") {
    val p = s"${tmpDir("vt")}/t"
    val big = ss.range(0L, 4000L).select(col("id").as("key"),
      concat(lit("t"), col("id")).as("tag"),
      col("id").cast("double").as("bal"))
    VersionedTable.init(ss, p, big, clusterBy = Seq("key"), numFiles = 8)
    val before = VersionedTable.files(p).toSet
    assert(before.size >= 6, s"clustered init lays out ~8 files: $before")
    // the delta touches keys 10..12 — inside one file's key range
    val d = Seq((10L, "x", 1.0), (11L, "x", 2.0), (12L, "x", 3.0))
      .toDF("key", "tag", "bal")
    VersionedTable.merge(ss, p, d, Seq("key"))
    val after = VersionedTable.files(p).toSet
    val shared = (before intersect after).size
    assert(shared >= before.size - 2,
      s"a 3-row merge must share nearly all files ($shared of ${before.size})")
    assert((after -- before).nonEmpty && (after -- before).size <= 2,
      "the rewrite is delta-sized, not table-sized")
    // and the content is exactly the merged state
    assert(VersionedTable.read(ss, p).count() === 4000L)
    assert(VersionedTable.read(ss, p).filter(col("key") === 11L)
      .collect().head.getAs[String]("tag") === "x")
    // v1 stays readable in full (its files were shared or kept)
    assert(VersionedTable.read(ss, p, Some(1L)).filter(col("key") === 11L)
      .collect().head.getAs[String]("tag") === "t11")
  }

  test("pruning falls back to range-only past the comparison budget " +
      "and stays O(delta) for a contiguous delta") {
    val p = s"${tmpDir("vt")}/t"
    val big = ss.range(0L, 4000L).select(col("id").as("key"),
      concat(lit("t"), col("id")).as("tag"),
      col("id").cast("double").as("bal"))
    VersionedTable.init(ss, p, big, clusterBy = Seq("key"), numFiles = 8)
    val before = VersionedTable.files(p).toSet
    val d = Seq((10L, "x", 1.0), (11L, "x", 2.0)).toDF("key", "tag", "bal")
    // budget 0 forces the range-only path; a contiguous 2-key delta
    // still overlaps only one file's key range
    VersionedTable.mergeWithHook(ss, p, d, Seq("key"), lit(false), 0,
      maxPruneComparisons = 0L)(() => ())
    val after = VersionedTable.files(p).toSet
    assert((before intersect after).size >= before.size - 2,
      "range-only pruning still shares nearly all files")
    assert(VersionedTable.read(ss, p).count() === 4000L)
    assert(VersionedTable.read(ss, p).filter(col("key") === 10L)
      .collect().head.getAs[String]("tag") === "x")
  }

  test("two concurrent mergers both land (optimistic-concurrency CAS)") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base, clusterBy = Seq("key"))
    val m1 = Seq((1L, "a2", 11.0)).toDF("key", "tag", "bal")
    val m2 = Seq((5L, "e", 50.0)).toDF("key", "tag", "bal")
    // writer 1 stages its rewrite; IN ITS COMMIT WINDOW writer 2 merges
    // and wins version 2. Writer 1's CAS then fails, it discards its
    // staged files, re-derives against v2, and lands as v3 — BOTH
    // change sets present, nobody last-write-wins the other.
    var raced = false
    val v = VersionedTable.mergeWithHook(ss, p, m1, Seq("key"),
      lit(false), 0) { () =>
      if (!raced) { raced = true; VersionedTable.merge(ss, p, m2, Seq("key")) }
    }
    assert(v === 3L, "the losing merger re-derives and commits the next version")
    assert(VersionedTable.versions(p) === Seq(1L, 2L, 3L))
    assert(state(p) === Map(1L -> (("a2", 11.0)), 2L -> (("b", 20.0)),
      3L -> (("c", 30.0)), 5L -> (("e", 50.0))))
    // the intermediate version holds ONLY the race winner's change
    assert(state(p, Some(2L)) === Map(1L -> (("a", 10.0)),
      2L -> (("b", 20.0)), 3L -> (("c", 30.0)), 5L -> (("e", 50.0))))
  }

  test("compact: file growth from many merges collapses into a new " +
      "version with identical content; history and pruning survive") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base, clusterBy = Seq("key"))
    // ten point merges: O(delta) commits each add a fresh file
    for (i <- 1 to 10)
      VersionedTable.merge(ss, p,
        Seq((100L + i, s"n$i", i.toDouble)).toDF("key", "tag", "bal"),
        Seq("key"))
    val grown = VersionedTable.files(p).size
    assert(grown >= 10, s"each merge adds at least one file ($grown)")
    val before = state(p)
    val v = VersionedTable.compact(ss, p, Seq("key"), numFiles = 2)
    assert(v === 12L, "compaction commits as the next version")
    assert(VersionedTable.files(p).size <= 2, "file count collapsed")
    assert(state(p) === before, "content unchanged by compaction")
    // history: the pre-compact version still reads
    assert(state(p, Some(11L)) === before)
    // the compacted files carry key stats: a point merge stays O(delta)
    val fBefore = VersionedTable.files(p).toSet
    VersionedTable.merge(ss, p,
      Seq((101L, "z", 0.5)).toDF("key", "tag", "bal"), Seq("key"))
    val fAfter = VersionedTable.files(p).toSet
    assert((fBefore intersect fAfter).size >= fBefore.size - 1,
      "post-compact merge rewrites at most one compacted file")
  }

  test("a table with its own 'op' column refuses readChanges loudly") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, Seq((1L, "U")).toDF("key", "op"))
    VersionedTable.merge(ss, p, Seq((2L, "I")).toDF("key", "op"), Seq("key"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readChanges(ss, p, 1L, 2L, Seq("key"))
    }
    assert(e.getMessage.contains("op"))
  }

  test("versions past 8 digits stay visible (manifest name parse)") {
    val p = s"${tmpDir("vt")}/t"
    VersionedTable.init(ss, p, base)
    val vd = new java.io.File(p, "_versions")
    java.nio.file.Files.write(
      new java.io.File(vd, "123456789.json").toPath, "{}".getBytes("UTF-8"))
    assert(VersionedTable.versions(p) === Seq(1L, 123456789L))
  }
}
