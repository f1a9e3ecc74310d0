package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Storage-layout maintenance for parquet tables — the two jobs a
  * 100 TB table needs run on a schedule, not the query path:
  *
  *  - [[compactParquet]]: the small-file problem. Streaming appends and
  *    fine-grained batch writes leave thousands of KB-sized files; at
  *    scan time each costs a task + a footer read + an object-store
  *    GET, and planners cap at file granularity, so a million tiny
  *    files caps the scan at a million tiny tasks. Compaction rewrites
  *    the directory at a target file size and swaps it in.
  *  - [[writeClustered]]: data-skipping layout. Parquet keeps min/max
  *    stats per row group; they only prune if values are clustered.
  *    A range-repartition + in-partition sort gives globally disjoint
  *    per-file ranges on the cluster key, so a range predicate prunes
  *    to the few files whose interval intersects it (the CLUSTER BY /
  *    Z-order-lite layout; one dimension here — compose a struct key
  *    for lexicographic multi-column clustering).
  */
object Layout {

  /** Rewrite a (non-partitioned) parquet directory into
    * ceil(totalBytes / targetFileBytes) files and atomically-ish swap
    * it in (rename old → bak, tmp → live, drop bak — the classic HDFS
    * pattern; on an object store without atomic rename, commit via a
    * manifest/catalog pointer instead). No-ops when the directory is
    * already at or below the target file count — an idempotent
    * scheduled job. Row-count parity is verified BEFORE the swap, so a
    * failed rewrite leaves the live directory untouched. For a
    * hive-partitioned table, run per partition directory (the list is
    * cheap; the rewrites parallelize as independent jobs).
    *
    * Returns (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val live = new Path(path)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(live)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val nBefore = files.length
    val totalBytes = files.map(_.getLen).sum
    val nTarget = math.max(1L,
      math.ceil(totalBytes.toDouble / targetFileBytes).toLong).toInt
    if (nTarget >= nBefore) return (nBefore, nBefore)
    val tmp = new Path(path + "__compact_tmp")
    val bak = new Path(path + "__compact_bak")
    val df = spark.read.parquet(path)
    val rowsBefore = df.count()
    df.repartition(nTarget).write.mode("overwrite").parquet(tmp.toString)
    val rowsAfter = spark.read.parquet(tmp.toString).count()
    require(rowsAfter == rowsBefore,
      s"compaction row drift: $rowsBefore -> $rowsAfter; live data untouched")
    require(fs.rename(live, bak), s"could not stage $live aside")
    require(fs.rename(tmp, live), s"could not promote $tmp")
    fs.delete(bak, true)
    (nBefore, nTarget)
  }

  /** Write `df` range-clustered on `sortCols`: `numFiles` range
    * partitions (sampled split points), rows sorted within each, one
    * parquet file per partition with a DISJOINT value interval on the
    * cluster key — the layout that makes min/max stats actually prune
    * range predicates. */
  def writeClustered(df: DataFrame, path: String, sortCols: Seq[String],
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
}
