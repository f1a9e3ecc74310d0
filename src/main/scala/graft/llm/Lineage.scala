package graft.llm

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Lineage-truncation plumbing shared by the iterative operators
  * (Corpus.bigStarClusters, Similarity.kmeansCentroids) and the
  * opt-in materializing dedup paths (Dedup.lshPairs).
  *
  * `SparkContext.setCheckpointDir` is GLOBAL session state, and the
  * value it stores is the qualified `dir/<UUID>` — so a naive
  * "set if different" guard compares apples to oranges and re-points
  * the session's checkpoint dir on every call, silently clobbering
  * whatever the caller had configured. [[withCheckpointDir]] scopes
  * the change instead: set, run the (eager — every checkpoint action
  * must complete inside the scope) body, restore. */
object Lineage {

  /** Run `body` with the context's checkpoint dir pointed at `dir`,
    * restoring the previous configuration afterwards. Restoration
    * re-qualifies: if a dir was set before, checkpoints after this
    * call land in a fresh UUID subdirectory UNDER the previously
    * qualified path (Spark offers no way to re-point at an existing
    * qualified dir) — same root, so any caller contract of the form
    * "my checkpoints live under X" still holds. If no dir was set
    * before, the context is returned to the unset state.
    *
    * Scoped calls are SERIALIZED (one global lock): the checkpoint dir
    * is process-global mutable state, and two overlapping scopes would
    * otherwise checkpoint into each other's directories mid-iteration
    * and "restore" each other's temporary value as permanent. The lock
    * is held for the whole body — concurrent reliable-checkpoint
    * pipelines in one driver queue behind each other, which is the
    * safe (and rare) case. */
  def withCheckpointDir[T](sc: SparkContext, dir: String)(body: => T): T =
    lock.synchronized {
      val prev = sc.getCheckpointDir
      sc.setCheckpointDir(dir)
      try body
      finally sc.setCheckpointDir(prev.orNull) // Option(null) → unset
    }

  private val lock = new Object

  /** Freshness fingerprint of a frame's FILE inputs: one 64-bit fold
    * over the sorted (path, length, modificationTime) of every leaf
    * file the plan reads. The training memos (Similarity.kmMemo/
    * pqMemo, Pca.memo) add this to their plan-canonicalization key so
    * an in-place overwrite — same path, same canonicalized plan, new
    * bytes — keys a MISS and retrains instead of silently serving
    * stale centroids (a plan-only key has Spark-relation-cache
    * staleness; REFRESH TABLE never reaches a driver-side memo, so
    * the key itself must carry input identity).
    *
    * Non-file inputs (in-memory relations, JDBC) contribute nothing —
    * `inputFiles` is empty — and those memo entries fall back to
    * plan-only keying, which is stated in each memo's scaladoc.
    * A file unlistable at snapshot time (deleted mid-overwrite) folds
    * a sentinel, which still changes the fingerprint → miss.
    *
    * Cost: one driver `getFileStatus` RPC per leaf file, paid once
    * per TRAINING call (not per query) — noise next to the Lloyd
    * iterations the memo exists to skip. */
  def inputSnapshot(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    var h = 1125899906842597L
    def mix(x: Long): Unit = { h = h * 6364136223846793005L + x }
    // Leaf files from the ANALYZED plan, not Dataset.inputFiles: that
    // helper reads the OPTIMIZED plan, where a persisted frame (the
    // training preps always are) is already substituted by its
    // InMemoryRelation and the file scan — hence the listing — is
    // gone, which would silently degrade every snapshot to the empty
    // fold and bring the stale-hit right back.
    val files = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles
          case _ => Array.empty[String]
        }
    }.flatten
    files.sorted.foreach { f =>
      mix(f.hashCode.toLong)
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        mix(st.getLen); mix(st.getModificationTime)
      } catch { case _: java.io.IOException => mix(-1L) }
    }
    h
  }
}
