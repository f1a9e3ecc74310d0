package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{DataChecks, Upsert}
import graft.planner.MetricState
import graft.planner.MetricState.Measure
import graft.sinks.SnapshotTable
import graft.sources.Tables

/** End-to-end warehouse lifecycle over one snapshot-committed table:
  * append → incremental merge (late corrections) → incremental metric
  * refresh → quality gate → compact → vacuum — each stage feeding the
  * next, with correctness asserted against one-shot recomputes. */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("append → merge corrections → metric state → checks → compact → vacuum") {
    val table = Files.createTempDirectory("graft-lifecycle").toString + "/events"
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cut = to_date(lit("2024-01-16"))

    // 1) initial load: first half of the month, fragmented as a
    //    streaming landing would leave it
    SnapshotTable.append(spark, table,
      ev.filter(to_date(col("ts")) < cut).repartition(12))
    // 2) second half arrives PLUS late corrections: every event_id % 97
    //    row from the first half is re-delivered with value + 1000
    val corrections = ev.filter(to_date(col("ts")) < cut)
      .filter(col("event_id") % 97 === 0)
      .withColumn("value", col("value") + 1000)
    val delta = ev.filter(to_date(col("ts")) >= cut).unionByName(corrections)
    Upsert.mergeParquet(spark, table, delta, Seq("event_id"))

    // ground truth: full data with the first-half corrections applied
    val corrected = col("event_id") % 97 === 0 && to_date(col("ts")) < cut
    val truth = ev.filter(!corrected)
      .unionByName(ev.filter(corrected).withColumn("value", col("value") + 1000))
    val current = SnapshotTable.read(spark, table)
    assert(current.count() == truth.count())
    val sumGot = current.agg(sum("value")).head().getDouble(0)
    val sumWant = truth.agg(sum("value")).head().getDouble(0)
    assert(math.abs(sumGot - sumWant) < 1e-6, s"$sumGot vs $sumWant")

    // 3) incremental metric state over the merged table equals the
    //    one-shot aggregate of the truth
    val dims = Seq("event_type", "day")
    val ms = Seq(Measure("value", "value"))
    def withDay(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("day", to_date(col("ts")))
    val stateA = MetricState.buildState(
      withDay(current).filter(col("day") < cut), dims, ms)
    val stateB = MetricState.buildState(
      withDay(current).filter(col("day") >= cut), dims, ms)
    val rendered = MetricState.render(MetricState.mergeStates(Seq(stateA, stateB)))
      .orderBy("event_type", "day").collect().toSeq
    val oneShot = MetricState.render(
      MetricState.buildState(withDay(truth), dims, ms))
      .orderBy("event_type", "day").collect().toSeq
    assert(rendered == oneShot)

    // 4) quality gate on the served table
    val checks = DataChecks.suite(Seq(
      DataChecks.tableChecks(current, "events", Seq("event_id", "ts"),
        Map("event_type" ->
          Seq("view", "click", "signup", "purchase", "error"))),
      DataChecks.unique(current, "events", Seq("event_id")))).collect()
    assert(checks.forall(_.getBoolean(4)),
      checks.filterNot(_.getBoolean(4)).mkString(", "))
    val fresh = DataChecks.freshness(current, "events", "ts",
      lit("2024-01-31 00:00:00"), warnAfterSec = 7 * 86400,
      errorAfterSec = 30 * 86400).head()
    assert(fresh.getString(3) == "pass", fresh.toString)

    // 5) upkeep: compact the fragmented history, retire old snapshots;
    //    the served answer must be unchanged
    SnapshotTable.compact(spark, table, targetFiles = 2)
    val (retired, reclaimed) = SnapshotTable.vacuum(spark, table, retain = 1)
    assert(retired >= 2 && reclaimed > 0, s"($retired, $reclaimed)")
    val after = SnapshotTable.read(spark, table)
    assert(after.count() == truth.count())
    assert(after.inputFiles.length <= 2)
    assert(math.abs(after.agg(sum("value")).head().getDouble(0) - sumWant) < 1e-6)
  }
}
