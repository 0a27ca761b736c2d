package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Snapshot time travel + retention for the MERGE/CDC sink — the
  * multi-generation complement of [[Sinks.merge]]'s in-place swap
  * (which keeps exactly one generation; a production MERGE contract
  * reads "as of version N" and vacuums old snapshots, the
  * Delta/Iceberg table shape re-expressed over plain parquet dirs and
  * a manifest directory).
  *
  * Layout under the table root:
  * {{{
  *   <path>/_versions/00000001.json   commit manifests, one per version
  *   <path>/snap-00000001/            immutable parquet snapshot dirs
  *   <path>/_pins/<id>.pin            reader pins (version holds)
  * }}}
  *
  * Commit protocol: a writer stages the FULL next snapshot under
  * `snap-<v>` (Spark writes `_SUCCESS` last), then publishes with ONE
  * atomic manifest rename — `_versions/.tmp-<v>` → `_versions/<v>.json`.
  * The rename is the commit point: a crash before it leaves an
  * unpublished `snap-` dir that [[vacuum]] clears as debris (writers
  * allocate strictly above the current version, so debris below it can
  * never be in-flight); a rename that fails because the destination
  * exists means another writer won that version — the loser restages
  * at the next number (optimistic concurrency, Delta's protocol).
  *
  * Readers resolve a manifest — latest, or a pinned/explicit version —
  * and scan that snapshot dir. Snapshot dirs are IMMUTABLE: a merge
  * never touches prior dirs, so a reader holding version N survives
  * any number of concurrent merges, and [[vacuum]] is the only delete
  * path. Vacuum keeps the newest `keep` versions, the current version,
  * and every pinned version; pins are files so they hold across
  * processes and crashes (stale ones are the operator's to clear —
  * same contract as Delta's retention override).
  *
  * Scale shape: identical to [[Sinks.merge]] — the per-merge cost is
  * the key-shuffled (or AQE-broadcast) full-outer join and a full
  * snapshot rewrite; at 100 TB, partition the table and version per
  * partition, or swap file-level manifests in under the SAME commit
  * protocol (manifest rename as the commit point is unchanged). The
  * versioning layer itself adds one directory listing per read and one
  * rename per commit — nothing data-sized. */
object VersionedTable {

  private val Pad = 8

  private def versionsDir(path: String) = new File(path.stripSuffix("/"), "_versions")
  private def pinsDir(path: String) = new File(path.stripSuffix("/"), "_pins")
  private def snapDir(path: String, v: Long) =
    new File(path.stripSuffix("/"), f"snap-$v%08d")
  private def manifest(path: String, v: Long) =
    new File(versionsDir(path), f"$v%08d.json")

  private def parseVersion(name: String): Option[Long] =
    if (name.endsWith(".json") && name.length == Pad + 5)
      name.stripSuffix(".json").toLongOption
    else None

  /** All committed versions, ascending (empty for a missing table). */
  def versions(path: String): Seq[Long] =
    Option(versionsDir(path).listFiles()).getOrElse(Array.empty)
      .flatMap(f => parseVersion(f.getName)).toSeq.sorted

  /** The latest committed version, if any. */
  def currentVersion(path: String): Option[Long] = versions(path).lastOption

  /** Create the table at version 1. Fails if the table already has
    * committed versions (use [[merge]] or [[overwrite]] to evolve). */
  def init(spark: SparkSession, path: String, df: DataFrame): Long = {
    require(currentVersion(path).isEmpty,
      s"versioned table at $path already exists (current " +
        s"version ${currentVersion(path).get}); use merge/overwrite")
    commit(path, df)
  }

  /** Full-snapshot replace as a NEW version (the blind-write path —
    * CTAS semantics; prior versions stay readable until vacuumed). */
  def overwrite(spark: SparkSession, path: String, df: DataFrame): Long =
    commit(path, df)

  /** MERGE INTO the current snapshot, committing the result as a new
    * version — same join shape, key-uniqueness contract, and
    * `graft_merge` observe metrics as [[Sinks.merge]] (shared code).
    * Returns the committed version. Merge writers are SINGLE-WRITER
    * by contract (the Sinks.merge/compact maintenance rule): the
    * commit race-retry below re-stages the SAME derived snapshot, so
    * two concurrent merges would last-write-wins each other rather
    * than serialize — readers are the concurrency this layer buys. */
  def merge(spark: SparkSession, path: String, source: DataFrame,
            keys: Seq[String],
            deleteWhen: org.apache.spark.sql.Column = lit(false)): Long = {
    val cur = currentVersion(path).getOrElse(
      throw new IllegalStateException(
        s"versioned table at $path has no committed version; init() first"))
    commit(path, Sinks.mergedFrame(read(spark, path, Some(cur)), source,
      keys, deleteWhen))
  }

  /** Read the table — the latest version, or `asOf` a specific one.
    * The returned plan scans an immutable snapshot dir, so it stays
    * valid across concurrent merges and until that version is
    * vacuumed. */
  def read(spark: SparkSession, path: String, asOf: Option[Long] = None)
      : DataFrame = {
    val v = asOf.getOrElse(currentVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path")))
    val m = manifest(path, v)
    if (!m.exists())
      throw new IllegalStateException(
        s"version $v of $path is not available (committed: " +
          s"${versions(path).mkString(",")}) — it was never committed or " +
          "has been vacuumed")
    spark.read.parquet(snapDir(path, v).getPath)
  }

  /** Change feed between two committed versions — the CDC READ side of
    * the time-travel contract (Delta's table_changes shape): one row
    * per key whose state differs between `fromV` and `toV`, classified
    * `op` ∈ {I, U, D} and carrying the `toV`-side payload (null
    * payload columns on a delete, the standard change-feed convention).
    * Unchanged keys never leave the join. The q_snapshot_diff
    * full-outer shape over two IMMUTABLE snapshot dirs, so the feed is
    * stable however many merges commit after `toV`; comparison is
    * null-safe per column (`<=>`), no content hashing. Consuming the
    * feed with [[merge]] (deleteWhen = op === "D") on a copy of
    * `fromV` reproduces `toV` exactly — VersionedTableSpec pins the
    * round trip. Scale: one key-shuffled (or AQE-broadcast) join over
    * the two snapshots; output is change-sized. */
  def readChanges(spark: SparkSession, path: String, fromV: Long,
                  toV: Long, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fromV < toV, s"readChanges wants fromV < toV, got $fromV >= $toV")
    val a = read(spark, path, Some(fromV)).withColumn("_ap", lit(1)).alias("a")
    val b = read(spark, path, Some(toV)).withColumn("_bp", lit(1)).alias("b")
    val cols = read(spark, path, Some(toV)).columns.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"change keys $keys must be table columns (${cols.mkString(",")})")
    val nonKey = cols.filterNot(keys.contains)
    val on = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val aHit = col("a._ap").isNotNull
    val bHit = col("b._bp").isNotNull
    val same = nonKey.map(c => col(s"a.$c") <=> col(s"b.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    a.join(b, on, "full_outer")
      .select(
        (when(aHit && !bHit, "D")
          .when(!aHit && bHit, "I")
          .when(!same, "U")).as("op") +:
        (keys.map(k => coalesce(col(s"b.$k"), col(s"a.$k")).as(k)) ++
          nonKey.map(c => col(s"b.$c").as(c))): _*)
      .filter(col("op").isNotNull)
  }

  /** Incremental CDC relay — checkpointed propagation of this table's
    * change feed into any consumer (the incremental
    * materialized-view-maintenance primitive): reads the last relayed
    * version from `checkpointFile`, hands `apply` the I/U/D feed from
    * there to the current version (or, on the FIRST relay, the full
    * current snapshot synthesized as inserts — the bootstrap), and
    * advances the checkpoint with an atomic tmp+rename ONLY after
    * `apply` returns. Crash between apply and checkpoint replays the
    * same feed — at-least-once, which is exactly-once in effect when
    * `apply` merges (same-change-set re-merge is a fixpoint, the
    * cdcApply reasoning). Returns Some((fromV, toV, result)) when work
    * was relayed, None when already caught up.
    *
    * A relay that falls behind a [[vacuum]] fails LOUDLY (readChanges
    * resolves a vacuumed base version to a clean error, never a
    * partial feed) — keep `vacuum(keep)` at or above the relay lag, or
    * [[pin]] the relay's floor. */
  def relayChanges[A](spark: SparkSession, path: String, keys: Seq[String],
                      checkpointFile: String)
                     (apply: (DataFrame, Long, Long) => A)
      : Option[(Long, Long, A)] = {
    import org.apache.spark.sql.functions._
    val cur = currentVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    val ckpt = new File(checkpointFile)
    val last: Long =
      if (!ckpt.exists()) 0L
      else {
        val m = "\"version\"\\s*:\\s*(\\d+)".r
          .findFirstMatchIn(new String(
            java.nio.file.Files.readAllBytes(ckpt.toPath),
            java.nio.charset.StandardCharsets.UTF_8))
        m.map(_.group(1).toLong).getOrElse(
          throw new IllegalStateException(s"unreadable relay checkpoint $ckpt"))
      }
    if (last >= cur) return None
    val feed =
      if (last == 0L) { // bootstrap: full current snapshot as inserts
        val snap = read(spark, path, Some(cur))
        snap.select(lit("I").as("op") +: snap.columns.map(col): _*)
      } else readChanges(spark, path, last, cur, keys)
    val out = apply(feed, last, cur)
    Option(ckpt.getParentFile).foreach(_.mkdirs())
    val tmp = new File(ckpt.getParentFile,
      "." + ckpt.getName + ".tmp")
    java.nio.file.Files.write(tmp.toPath,
      s"""{"version":$cur}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, ckpt.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Some((last, cur, out))
  }

  /** [[relayChanges]] into ANOTHER versioned table: bootstrap inits the
    * destination, every later relay merges the feed (deletes honored
    * via op = D) as a new destination version — chained tables each
    * keep their own history while staying content-equal to the source
    * at every relay point. Returns the destination version committed,
    * or None when caught up. */
  def relayInto(spark: SparkSession, srcPath: String, dstPath: String,
                keys: Seq[String], checkpointFile: String): Option[Long] = {
    import org.apache.spark.sql.functions.col
    relayChanges(spark, srcPath, keys, checkpointFile) { (feed, from, _) =>
      if (from == 0L) init(spark, dstPath, feed.drop("op"))
      else merge(spark, dstPath, feed, keys,
        deleteWhen = col("op") === "D")
    }.map(_._3)
  }

  /** Pin `version` (default: current) against [[vacuum]]. Returns the
    * pin id; release with [[unpin]]. Pins are files — they survive the
    * process and hold for OTHER processes' vacuums too. */
  def pin(path: String, version: Option[Long] = None): String = {
    val v = version.getOrElse(currentVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path")))
    require(manifest(path, v).exists(), s"cannot pin uncommitted version $v")
    pinsDir(path).mkdirs()
    val id = f"$v%08d-${java.util.UUID.randomUUID().toString.take(8)}"
    val f = new File(pinsDir(path), s"$id.pin")
    require(f.createNewFile(), s"pin file $f already exists")
    id
  }

  /** Release a pin taken with [[pin]]. Idempotent. */
  def unpin(path: String, pinId: String): Unit = {
    val f = new File(pinsDir(path), s"$pinId.pin")
    if (f.exists()) require(f.delete(), s"could not delete pin $f")
  }

  /** Loan a pinned read: resolves the current version, pins it, hands
    * the snapshot DataFrame over, and unpins on exit — the reader
    * survives any merges AND vacuums that run inside `use`. */
  def withPinned[A](spark: SparkSession, path: String)
                   (use: DataFrame => A): A = {
    val v = currentVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed version at $path"))
    val id = pin(path, Some(v))
    try use(read(spark, path, Some(v)))
    finally unpin(path, id)
  }

  private def pinnedVersions(path: String): Set[Long] =
    Option(pinsDir(path).listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName.take(Pad).toLongOption).toSet

  /** Retention: keep the newest `keep` committed versions, plus the
    * current version and every pinned one; delete the others'
    * manifests THEN snapshot dirs (manifest-first, so a reader racing
    * the delete resolves a clean "vacuumed" error, never a live
    * manifest over a half-deleted dir). Also clears unpublished
    * `snap-` debris BELOW the current version — a crashed writer's
    * staging; writers allocate above current, so nothing in-flight is
    * touched. Returns the versions removed. */
  def vacuum(path: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "vacuum must keep at least the current version")
    val all = versions(path)
    if (all.isEmpty) return Nil
    val cur = all.last
    val keepSet = all.takeRight(keep).toSet ++ pinnedVersions(path) + cur
    val drop = all.filterNot(keepSet)
    drop.foreach { v =>
      require(manifest(path, v).delete(), s"could not delete manifest for $v")
      org.apache.commons.io.FileUtils.deleteDirectory(snapDir(path, v))
    }
    // unpublished staging dirs below current = crash debris
    Option(new File(path.stripSuffix("/")).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
      .flatMap(f => f.getName.stripPrefix("snap-").toLongOption.map(f -> _))
      .filter { case (_, v) => v < cur && !manifest(path, v).exists() }
      .foreach { case (f, _) =>
        org.apache.commons.io.FileUtils.deleteDirectory(f)
      }
    drop
  }

  /** Stage the full snapshot, then publish with one atomic manifest
    * rename; on a lost race (another writer committed the same
    * number), restage at the next version. */
  private def commit(path: String, df: DataFrame): Long = {
    versionsDir(path).mkdirs()
    var v = currentVersion(path).getOrElse(0L) + 1
    while (true) {
      val snap = snapDir(path, v)
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(snap.getPath)
      val tmp = new File(versionsDir(path), f".tmp-$v%08d")
      val payload = s"""{"version":$v,"dir":"${snap.getName}"}"""
      java.nio.file.Files.write(tmp.toPath,
        payload.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (manifest(path, v).exists() || !tmp.renameTo(manifest(path, v))) {
        // lost the race: clear our staging and retry one version up
        tmp.delete()
        org.apache.commons.io.FileUtils.deleteDirectory(snap)
        v = math.max(v + 1, currentVersion(path).getOrElse(0L) + 1)
      } else return v
    }
    v // unreachable
  }
}
