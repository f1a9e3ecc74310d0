package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.planner.MetricState
import graft.planner.MetricState.Measure
import graft.sources.Tables

/** Incremental metric maintenance: partial-state build / merge /
  * render must be indistinguishable from a one-shot aggregate, under
  * any batch split and through a parquet round-trip of the state. */
class MetricStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private val dims = Seq("event_type", "day")
  private val ms = Seq(Measure("value", "value"))

  private def events = Tables.load(spark, dir, "events")
    .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))

  private def oneShot = MetricState.render(
    MetricState.buildState(events, dims, ms))
    .orderBy("event_type", "day").collect().toSeq

  test("merge of per-batch states equals the one-shot aggregate") {
    val ev = events
    // three uneven batches, split on a non-dim column so groups span
    // batches (the case that actually exercises the merge)
    val batches = Seq(
      ev.filter(col("value") < 10),
      ev.filter(col("value") >= 10 && col("value") < 200),
      ev.filter(col("value") >= 200 || col("value").isNull))
    val merged = MetricState.render(MetricState.mergeStates(
      batches.map(b => MetricState.buildState(b, dims, ms))))
      .orderBy("event_type", "day").collect().toSeq
    assert(merged == oneShot)
  }

  test("state survives a parquet round-trip and still merges (schema-derived)") {
    val ev = events
    val cut = to_date(lit("2024-01-16"))
    val base = Files.createTempDirectory("graft-mstate").toString
    MetricState.buildState(ev.filter(col("day") < cut), dims, ms)
      .write.parquet(s"$base/state")
    // cold read-back: merge structure must come from the schema alone
    val prior = spark.read.parquet(s"$base/state")
    val delta = MetricState.buildState(ev.filter(col("day") >= cut), dims, ms)
    val refreshed = MetricState.render(MetricState.mergeStates(Seq(prior, delta)))
      .orderBy("event_type", "day").collect().toSeq
    assert(refreshed == oneShot)
  }

  test("merge is order-insensitive (monoid commutativity)") {
    val ev = events
    val cut = to_date(lit("2024-01-10"))
    val a = MetricState.buildState(ev.filter(col("day") < cut), dims, ms)
    val b = MetricState.buildState(ev.filter(col("day") >= cut), dims, ms)
    val ab = MetricState.render(MetricState.mergeStates(Seq(a, b)))
      .orderBy("event_type", "day").collect().toSeq
    val ba = MetricState.render(MetricState.mergeStates(Seq(b, a)))
      .orderBy("event_type", "day").collect().toSeq
    assert(ab == ba)
  }

  test("merge plan shuffles state rows only: one aggregate over the union, no join") {
    val ev = events
    val a = MetricState.buildState(ev.filter(col("value") < 100), dims, ms)
    val b = MetricState.buildState(ev.filter(col("value") >= 100), dims, ms)
    val plan = MetricState.mergeStates(Seq(a, b))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Union"), plan)
  }
}
