package graft.sinks

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-committed parquet tables: manifest-pointer commits with
  * snapshot isolation, time travel, and optimistic concurrency — the
  * table-format layer (Iceberg/Delta's core idea, pared to the
  * mechanism) that [[Layout.compactParquet]]'s scaladoc defers to for
  * object stores without atomic directory rename.
  *
  * Why a 100 TB table needs this:
  *  - **Commits are one file publish.** Writers stage data files under
  *    `data/<uuid>/` (invisible — readers never list directories),
  *    then publish a snapshot manifest enumerating every live file.
  *    A crash mid-write leaves orphan data files, never a torn table.
  *  - **Reads are listing-free.** The reader resolves the manifest's
  *    explicit file list; on an object store that replaces a
  *    million-key LIST with one GET, and the list is immutable, so a
  *    query planned against snapshot N is repeatable mid-compaction.
  *  - **Maintenance never blocks reads.** Compaction rewrites files
  *    and commits a NEW snapshot; readers pinned to older snapshots
  *    keep their files until [[vacuum]] retires them.
  *  - **Concurrent writers are safe, not serialized by a lock.**
  *    A snapshot id is claimed by EXCLUSIVE CREATE of its manifest
  *    (`create(overwrite=false)` — atomic on HDFS; POSIX rename
  *    overwrites, so rename cannot claim). The losing racer re-reads
  *    the head and retries on a fresh id (bounded). On S3 the same
  *    claim is a conditional PUT (If-None-Match: *).
  *
  * Manifest format: `snapshots/<id>.list`, one staged-file path per
  * line (paths relative to the table root, so tables survive moves),
  * terminated by a `#end` sentinel. A writer that died mid-manifest
  * leaves a sentinel-less file: never readable, excluded from head
  * resolution, and reclaimed by the next committer once stale.
  */
object SnapshotTable {

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private def snapDir(table: String) = new Path(s"$table/snapshots")

  private val Sentinel = "#end"

  private def rawLines(f: FileSystem, p: Path): Seq[String] = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Committed (sentinel-complete) snapshot ids, ascending — a torn
    * manifest from a dead writer is not a snapshot. */
  def snapshots(spark: SparkSession, table: String): Seq[Long] = {
    val d = snapDir(table)
    val f = fs(spark, table)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq
      .filter(_.getPath.getName.endsWith(".list"))
      .filter(s => rawLines(f, s.getPath).lastOption.contains(Sentinel))
      .map(_.getPath.getName.stripSuffix(".list").toLong).sorted
  }

  private def readManifest(spark: SparkSession, table: String,
      id: Long): Seq[String] = {
    val lines = rawLines(fs(spark, table),
      new Path(snapDir(table), s"$id.list"))
    require(lines.lastOption.contains(Sentinel),
      s"torn manifest $id.list under $table (writer died mid-commit)")
    lines.dropRight(1)
  }

  /** Stage `df` as parquet under an invisible uuid directory; return
    * the staged files relative to the table root. */
  private def stage(spark: SparkSession, table: String,
      df: DataFrame): Seq[String] = {
    val rel = s"data/${UUID.randomUUID()}"
    df.write.parquet(s"$table/$rel")
    val f = fs(spark, table)
    f.listStatus(new Path(s"$table/$rel")).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$rel/${s.getPath.getName}")
  }

  /** Test seam: invoked between the slot claim and the manifest
    * write — lets a spec simulate a writer stalled (GC pause, network
    * partition) long enough for its torn slot to be reclaimed. */
  @volatile private[graft] var pauseAfterClaim: Path => Unit = _ => ()

  /** Test seam: number of upcoming fence read-backs to fail with an
    * injected IOException (simulates transient manifest-read errors
    * AFTER the commit is already durable). */
  @volatile private[graft] var failFenceReads: Int = 0

  /** Fence read-back with bounded retry. A transient read failure is
    * NOT evidence the claim was lost — the manifest may be durable and
    * ours — so retry a few times before conceding `Nil` (treated as
    * claim-lost by the caller; safe because [[append]]'s recompute is
    * idempotent over the staged paths). */
  private def fenceRead(f: FileSystem, slot: Path): Seq[String] = {
    var attempt = 0
    while (attempt < 3) {
      try {
        if (failFenceReads > 0) {
          failFenceReads -= 1
          throw new java.io.IOException("injected fence-read failure")
        }
        return rawLines(f, slot)
      } catch {
        // the slot file being GONE is definitive (a racer reclaimed
        // our stale claim and removed it) — retrying cannot succeed,
        // so concede immediately instead of burning the backoff
        case _: java.io.FileNotFoundException => return Nil
        case _: java.io.IOException =>
          attempt += 1
          if (attempt < 3) Thread.sleep(25L * attempt)
      }
    }
    Nil
  }

  /** Publish the next snapshot: claim `<id>.list` by exclusive create,
    * then write file lines + sentinel. A losing racer's create throws
    * (slot taken) — re-read the head, recompute against it via
    * `nextFiles`, retry on the next id; data staging stays OUTSIDE
    * this loop, so contention costs a manifest write, never a data
    * rewrite. A slot held by a sentinel-less manifest older than
    * `staleMs` is a dead writer's wreckage: deleted and reclaimed.
    *
    * Reclaim is FENCED on the writer side: a live writer stalled past
    * `staleMs` between `create()` and `close()` can have its slot
    * reclaimed and re-committed by a racer — its own stream then
    * drains into an unlinked file and `close()` still succeeds. The
    * durable slot content is the arbiter: after close the writer
    * reads the slot back and only returns the id when the manifest
    * there is byte-for-byte its own; otherwise the claim was lost and
    * it retries against the new head (staged data untouched — only
    * the manifest write repeats). */
  private def commit(spark: SparkSession, table: String,
      nextFiles: Seq[String] => Seq[String], attempts: Int = 10,
      staleMs: Long = 60000): Long = {
    val f = fs(spark, table)
    f.mkdirs(snapDir(table))
    var tries = 0
    while (tries < attempts) {
      val head = snapshots(spark, table).lastOption
      val id = head.getOrElse(-1L) + 1
      val files = nextFiles(head.map(readManifest(spark, table, _))
        .getOrElse(Seq.empty))
      val slot = new Path(snapDir(table), s"$id.list")
      val claimed =
        try Some(f.create(slot, false))
        catch {
          case _: java.io.IOException =>
            // slot taken: by a racing committer (valid manifest — move
            // on) or by a dead writer (torn + stale — reclaim)
            val st = try Some(f.getFileStatus(slot)) catch {
              case _: java.io.IOException => None
            }
            st.foreach { s =>
              val torn = !rawLines(f, slot).lastOption.contains(Sentinel)
              if (torn &&
                  System.currentTimeMillis() - s.getModificationTime > staleMs)
                f.delete(slot, false)
            }
            None
        }
      claimed match {
        case Some(out) =>
          pauseAfterClaim(slot)
          val payload = files :+ Sentinel
          try out.write(payload.mkString("", "\n", "\n").getBytes("UTF-8"))
          finally out.close()
          // fence: prove the durable manifest at the slot is OURS —
          // a racer may have reclaimed the claim as stale wreckage
          // while we stalled, and our stream then wrote into an
          // unlinked file with a successful close()
          val durable = fenceRead(f, slot)
          if (durable == payload) return id
          tries += 1
        case None => tries += 1
      }
    }
    sys.error(s"snapshot commit contention: gave up after $attempts attempts")
  }

  /** Append: stage the rows, then publish prior-files + staged-files.
    * The stage is the expensive distributed write and happens OUTSIDE
    * the commit loop; a commit retry re-publishes the already-staged
    * files against the new head, so contention costs a manifest write,
    * not a data rewrite. The recompute dedupes (`distinct`): if a
    * prior attempt DID commit but its fence read-back failed even
    * after retries, the new head already contains the staged paths —
    * without the dedupe the retry would list them twice and readers
    * would silently double every appended row. Staged paths are
    * uuid-unique, so `distinct` can only collapse that self-overlap. */
  def append(spark: SparkSession, table: String, df: DataFrame): Long = {
    val staged = stage(spark, table, df)
    commit(spark, table, prior => (prior ++ staged).distinct)
  }

  /** Replace the table contents with `df` (still snapshot-isolated —
    * prior snapshots keep reading their files until vacuum). */
  def overwrite(spark: SparkSession, table: String, df: DataFrame): Long = {
    val staged = stage(spark, table, df)
    commit(spark, table, _ => staged)
  }

  /** Read a snapshot (default: newest) by its explicit file list —
    * no directory listing, stable under concurrent commits. */
  def read(spark: SparkSession, table: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val ids = snapshots(spark, table)
    require(ids.nonEmpty, s"no committed snapshots under $table")
    val id = snapshotId.getOrElse(ids.max)
    require(ids.contains(id), s"unknown snapshot $id (have $ids)")
    val files = readManifest(spark, table, id).map(r => s"$table/$r")
    spark.read.parquet(files: _*)
  }

  /** Compact the current snapshot's files into `targetFiles` and
    * commit the rewrite as a NEW snapshot. Readers of older snapshots
    * are untouched — their files are only reclaimed by [[vacuum]].
    * No-ops (returns the current id) when already at/below target. */
  def compact(spark: SparkSession, table: String, targetFiles: Int): Long = {
    val head = snapshots(spark, table).max
    if (readManifest(spark, table, head).size <= targetFiles) return head
    val staged = stage(spark, table,
      read(spark, table, Some(head)).repartition(targetFiles))
    commit(spark, table, _ => staged)
  }

  /** Retire history: keep the newest `retain` snapshots, delete older
    * manifests and every data file no kept snapshot references.
    * Deletion order (manifests first) means a crash mid-vacuum leaves
    * unreferenced files — harmless — never a manifest pointing at
    * deleted files. Returns (#manifests, #files) removed. */
  def vacuum(spark: SparkSession, table: String,
      retain: Int = 2): (Int, Int) = {
    val f = fs(spark, table)
    val ids = snapshots(spark, table)
    val (old, kept) = ids.splitAt(math.max(0, ids.size - retain))
    val live = kept.flatMap(readManifest(spark, table, _)).toSet
    old.foreach(id => f.delete(new Path(snapDir(table), s"$id.list"), false))
    val dataRoot = new Path(s"$table/data")
    var dropped = 0
    if (f.exists(dataRoot)) {
      val it = f.listFiles(dataRoot, true)
      val toDrop = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet")) {
          val rel = s.getPath.toString.stripPrefix(
            f.makeQualified(new Path(table)).toString + "/")
          if (!live.contains(rel)) toDrop += s.getPath
        }
      }
      toDrop.foreach { p => f.delete(p, false); dropped += 1 }
      // drop now-empty uuid dirs
      f.listStatus(dataRoot).foreach { d =>
        if (d.isDirectory && f.listStatus(d.getPath).isEmpty)
          f.delete(d.getPath, false)
      }
    }
    (old.size, dropped)
  }
}
