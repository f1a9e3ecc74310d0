package graft.llm

import org.apache.spark.SparkContext

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
}
