package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable
import graft.sources.Tables

/** Snapshot-committed tables: manifest-pointer commits, time travel,
  * non-blocking compaction, vacuum, torn-commit invisibility. */
class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def freshTable = Files.createTempDirectory("graft-snap").toString

  test("append commits snapshots; time travel reads each as-of") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val s1 = SnapshotTable.append(spark, t, docs.filter(col("doc_id") < 100))
    val s2 = SnapshotTable.append(spark, t, docs.filter(col("doc_id") >= 100))
    assert(SnapshotTable.snapshots(spark, t) == Seq(s1, s2))
    val n1 = docs.filter(col("doc_id") < 100).count()
    assert(SnapshotTable.read(spark, t, Some(s1)).count() == n1)
    assert(SnapshotTable.read(spark, t).count() == docs.count())
  }

  test("uncommitted staged data is invisible; a torn manifest is not a snapshot") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    SnapshotTable.append(spark, t, docs.filter(col("doc_id") < 50))
    val before = SnapshotTable.read(spark, t).count()
    // a writer that staged files but died before commit
    docs.filter(col("doc_id") >= 50).write.parquet(s"$t/data/orphan-job")
    assert(SnapshotTable.read(spark, t).count() == before)
    // a writer that died MID-manifest (no sentinel): not a snapshot
    val torn = new java.io.FileWriter(s"$t/snapshots/99.list")
    torn.write("data/orphan-job/nope.parquet\n"); torn.close()
    assert(SnapshotTable.snapshots(spark, t).forall(_ != 99L))
    assert(SnapshotTable.read(spark, t).count() == before)
  }

  test("compaction commits a new snapshot; pinned old snapshot keeps reading") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    // many small files
    SnapshotTable.append(spark, t, docs.repartition(16))
    val s1 = SnapshotTable.snapshots(spark, t).max
    val rows = SnapshotTable.read(spark, t).count()
    val s2 = SnapshotTable.compact(spark, t, targetFiles = 2)
    assert(s2 > s1)
    // new head: fewer files, same rows
    assert(SnapshotTable.read(spark, t).count() == rows)
    assert(SnapshotTable.read(spark, t).inputFiles.length <= 2)
    // reader pinned to the pre-compaction snapshot is untouched
    assert(SnapshotTable.read(spark, t, Some(s1)).count() == rows)
    // idempotent: already at target -> same head back
    assert(SnapshotTable.compact(spark, t, targetFiles = 2) == s2)
  }

  test("vacuum retires history and unreferenced files; retained reads survive") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    SnapshotTable.append(spark, t, docs.filter(col("doc_id") < 60).repartition(8))
    SnapshotTable.append(spark, t, docs.filter(col("doc_id") >= 60))
    SnapshotTable.compact(spark, t, targetFiles = 1)
    val rows = SnapshotTable.read(spark, t).count()
    val (ms, fsDropped) = SnapshotTable.vacuum(spark, t, retain = 1)
    assert(ms == 2, s"expected 2 retired manifests, got $ms")
    assert(fsDropped >= 8, s"expected >=8 reclaimed files, got $fsDropped")
    assert(SnapshotTable.snapshots(spark, t).size == 1)
    assert(SnapshotTable.read(spark, t).count() == rows)
  }

  test("overwrite replaces contents but history stays readable until vacuum") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val s1 = SnapshotTable.append(spark, t, docs)
    val small = docs.filter(col("doc_id") < 10)
    SnapshotTable.overwrite(spark, t, small)
    assert(SnapshotTable.read(spark, t).count() == small.count())
    assert(SnapshotTable.read(spark, t, Some(s1)).count() == docs.count())
  }

  test("paused writer whose slot is reclaimed keeps its commit (fencing)") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    SnapshotTable.append(spark, t, docs.filter(col("doc_id") < 10))
    val fsys = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // Simulate a writer stalled between create() and close() long
    // enough to look dead: backdate its freshly-claimed slot past
    // staleMs, then run a full competing append — the racer reclaims
    // the "stale wreckage" slot and commits its own manifest there.
    @volatile var fired = false
    SnapshotTable.pauseAfterClaim = { slot =>
      if (!fired) {
        fired = true
        SnapshotTable.pauseAfterClaim = _ => ()
        fsys.setTimes(slot, System.currentTimeMillis() - 120000L, -1L)
        SnapshotTable.append(spark, t,
          docs.filter(col("doc_id") >= 20 && col("doc_id") < 30))
      }
    }
    try {
      val idA = SnapshotTable.append(spark, t,
        docs.filter(col("doc_id") >= 10 && col("doc_id") < 20))
      // without the fence the paused writer returns the reclaimed id:
      // its manifest was never durable and its rows are silently lost
      val snaps = SnapshotTable.snapshots(spark, t)
      assert(snaps.size == 3, s"expected 3 committed snapshots, got $snaps")
      assert(idA == snaps.max, s"paused writer must land on a fresh id ($idA vs $snaps)")
      val want = docs.filter(col("doc_id") < 30).count()
      assert(SnapshotTable.read(spark, t).count() == want)
      assert(SnapshotTable.read(spark, t, Some(idA)).count() == want)
    } finally SnapshotTable.pauseAfterClaim = _ => ()
  }

  test("transient fence-read failure is retried, not treated as a lost claim") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    SnapshotTable.failFenceReads = 1 // first read-back throws; retry sees ours
    try {
      SnapshotTable.append(spark, t, docs.filter(col("doc_id") < 40))
      assert(SnapshotTable.snapshots(spark, t).size == 1,
        "one durable commit must yield exactly one snapshot")
      assert(SnapshotTable.read(spark, t).count() ==
        docs.filter(col("doc_id") < 40).count())
    } finally SnapshotTable.failFenceReads = 0
  }

  test("fence read-back failing after a durable commit never duplicates rows") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    SnapshotTable.append(spark, t, docs.filter(col("doc_id") < 10))
    // Exhaust ALL fence-read retries on an append whose manifest IS
    // durable: the writer concedes the claim and retries against the
    // new head — which already lists its staged files. The recompute
    // must dedupe or every appended row reads back twice.
    SnapshotTable.failFenceReads = 3
    try {
      val id = SnapshotTable.append(spark, t,
        docs.filter(col("doc_id") >= 10 && col("doc_id") < 30))
      val want = docs.filter(col("doc_id") < 30).count()
      assert(SnapshotTable.read(spark, t).count() == want,
        "appended rows must appear exactly once despite the blind retry")
      assert(SnapshotTable.read(spark, t, Some(id)).count() == want)
      val head = SnapshotTable.snapshots(spark, t).max
      val manifest = SnapshotTable.read(spark, t, Some(head)).inputFiles.toSeq
      assert(manifest.distinct.size == manifest.size,
        "head manifest must not list a file twice")
    } finally SnapshotTable.failFenceReads = 0
  }

  test("contending committers both land, on distinct ids, with both appends visible") {
    val t = freshTable
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    SnapshotTable.append(spark, t, docs.filter(col("doc_id") < 10))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val a = Future(SnapshotTable.append(spark, t,
      docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)))
    val b = Future(SnapshotTable.append(spark, t,
      docs.filter(col("doc_id") >= 20 && col("doc_id") < 30)))
    val ids = Seq(Await.result(a, 120.seconds), Await.result(b, 120.seconds))
    assert(ids.distinct.size == 2, s"ids collided: $ids")
    assert(SnapshotTable.read(spark, t).count() ==
      docs.filter(col("doc_id") < 30).count())
  }
}
