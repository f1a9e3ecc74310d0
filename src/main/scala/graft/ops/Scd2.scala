package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt snapshots (SCD Type 2, `check` strategy): track how a mutable
  * dimension's rows change over time as (payload, valid_from,
  * valid_to) version intervals, valid_to NULL = current.
  *
  * Semantics mirror dbt's snapshot materialization:
  *  - a key new in the delta INSERTS an open version;
  *  - a key whose tracked columns changed CLOSES the open version at
  *    `asOf` and inserts a new open one;
  *  - an unchanged key keeps its open version untouched;
  *  - a key absent from the delta stays open by default (dbt's
  *    default), or is closed at `asOf` when `invalidateHardDeletes`
  *    (dbt's flag of the same name);
  *  - closed history is IMMUTABLE — never joined, never rewritten.
  *
  * `asOf` is an explicit timestamp (dbt uses the run's
  * transaction time): passing it in keeps runs replayable and the
  * gate deterministic.
  *
  * 100 TB shape: the merge joins OPEN rows ⋈ delta on the key — both
  * sides are current-cardinality, never history-cardinality; closed
  * rows pass through untouched (with a storage layout partitioned on
  * `valid_to IS NULL`, the rewrite touches only the open partition,
  * and under [[graft.sinks.SnapshotTable]] each run is one atomic
  * commit). A NULL-safe comparison (`<=>`) per tracked column detects
  * change, so NULL→value and value→NULL transitions version correctly.
  */
object Scd2 {

  /** First snapshot of a source: every row becomes an open version. */
  def initial(source: DataFrame, asOf: Column): DataFrame =
    source
      .withColumn("valid_from", asOf.cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))

  /** Fold a new source state into a snapshot (dbt `check` strategy on
    * `checkCols`). `snapshot` must carry valid_from/valid_to plus the
    * key and tracked columns; `delta` is the CURRENT source state for
    * (at least) the keys it mentions. */
  def apply(snapshot: DataFrame, delta: DataFrame, key: String,
      checkCols: Seq[String], asOf: Column,
      invalidateHardDeletes: Boolean = false): DataFrame = {
    val at = asOf.cast("timestamp")
    val closed = snapshot.filter(col("valid_to").isNotNull)
    val open = snapshot.filter(col("valid_to").isNull)
    // carry the delta's FULL payload; checkCols only drive change
    // detection (dbt: check_cols may be a subset of the columns)
    val d = delta.select(delta.columns.map(c => col(c).as(s"__d_$c")).toIndexedSeq: _*)

    val j = open.join(d, col(key) === col(s"__d_$key"), "full_outer")
    val inDelta = col(s"__d_$key").isNotNull
    val inOpen = col(key).isNotNull
    val changed = checkCols.map(c => !(col(c) <=> col(s"__d_$c")))
      .reduce(_ || _)

    val keptOpen = j.filter(inOpen && (!inDelta && lit(!invalidateHardDeletes) ||
        (inDelta && !changed)))
      .select(open.columns.map(col): _*)
    val closedNow = j.filter(inOpen &&
        ((inDelta && changed) || (inDelta.unary_! && lit(invalidateHardDeletes))))
      .select(open.columns.map(col): _*)
      .withColumn("valid_to", at)
    val newVersions = j.filter(inDelta && (!inOpen || changed))
      .select(delta.columns.map(c => col(s"__d_$c").as(c)).toIndexedSeq ++
        Seq(at.as("valid_from"), lit(null).cast("timestamp").as("valid_to")): _*)

    closed.unionByName(keptOpen).unionByName(closedNow)
      .unionByName(newVersions, allowMissingColumns = true)
  }

  /** Point-in-time read: the version of each key valid at `ts` —
    * the time-travel SELECT a snapshot table exists for. */
  def asOfRead(snapshot: DataFrame, ts: Column): DataFrame =
    snapshot.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
}
