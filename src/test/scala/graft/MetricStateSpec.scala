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

  test("streaming fold: two ingest epochs land on the one-shot answer; replay is a no-op") {
    import graft.streaming.StreamingPipeline
    val base = Files.createTempDirectory("graft-mstream").toString
    val landing = s"$base/landing"; val state = s"$base/state"; val cp = s"$base/cp"
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cut = to_date(lit("2024-01-16"))

    // epoch 1: first half of the month
    ev.filter(to_date(col("ts")) < cut).write.parquet(landing)
    val q1 = StreamingPipeline.startMetricStateIngest(
      spark, landing, state, cp, dims, ms)
    assert(q1.awaitTermination(120000), "epoch-1 drain timed out")
    // epoch 2: the rest, same checkpoint -> new batch id
    ev.filter(to_date(col("ts")) >= cut).write.mode("append").parquet(landing)
    val q2 = StreamingPipeline.startMetricStateIngest(
      spark, landing, state, cp, dims, ms)
    assert(q2.awaitTermination(120000), "epoch-2 drain timed out")

    val streamed = StreamingPipeline.currentMetrics(spark, state)
      .orderBy("event_type", "day").collect().toSeq
    assert(streamed == oneShot)

    // crash-replay: re-execute the LAST epoch with the same batch id —
    // the versioned overwrite must leave the answer unchanged
    val lastBatch = ev.filter(to_date(col("ts")) >= cut)
    StreamingPipeline.metricStateBatch(lastBatch, state, dims, ms, batchId = 1L)
    val replayed = StreamingPipeline.currentMetrics(spark, state)
      .orderBy("event_type", "day").collect().toSeq
    assert(replayed == oneShot)
  }

  test("killed metric-state stream: restart from checkpoint lands one-shot truth") {
    import graft.streaming.StreamingPipeline
    val base = Files.createTempDirectory("graft-mcrash").toString
    val landing = s"$base/landing"; val state = s"$base/state"; val cp = s"$base/cp"
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cut = to_date(lit("2024-01-16"))
    ev.filter(to_date(col("ts")) < cut).write.parquet(landing)

    // kill after the v=0 state write, before the checkpoint commit —
    // the restart must replay batch 0 (idempotent overwrite), then
    // fold the second wave on top
    @volatile var fired = false
    StreamingPipeline.failpoint = { pt =>
      if (pt == "state:after-state-write" && !fired) {
        fired = true
        throw new RuntimeException("simulated state crash")
      }
    }
    try {
      val q1 = StreamingPipeline.startMetricStateIngest(
        spark, landing, state, cp, dims, ms)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination(120000)
      }
      assert(ex.toString.contains("simulated state crash"), ex.toString)
    } finally StreamingPipeline.failpoint = _ => ()

    ev.filter(to_date(col("ts")) >= cut).write.mode("append").parquet(landing)
    val q2 = StreamingPipeline.startMetricStateIngest(
      spark, landing, state, cp, dims, ms)
    assert(q2.awaitTermination(120000), "restart drain timed out")
    val streamed = StreamingPipeline.currentMetrics(spark, state)
      .orderBy("event_type", "day").collect().toSeq
    assert(streamed == oneShot,
      "crash + restart must be indistinguishable from a clean run")
  }

  test("torn v=N state dir (no _SUCCESS) is invisible; replay overwrites it") {
    import graft.streaming.StreamingPipeline
    val base = Files.createTempDirectory("graft-mtorn").toString
    val state = s"$base/state"
    val raw = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val cut = to_date(lit("2024-01-16"))
    val first = raw.filter(to_date(col("ts")) < cut)
    val rest = raw.filter(to_date(col("ts")) >= cut)
    StreamingPipeline.metricStateBatch(first, state, dims, ms, batchId = 0L)
    val committed = StreamingPipeline.currentMetrics(spark, state)
      .orderBy("event_type", "day").collect().toSeq

    // a crash mid-write of batch 1: data files land, job-commit marker
    // doesn't — stateVersions must NOT count this as the newest state
    MetricState.buildState(rest.withColumn("day", to_date(col("ts"))), dims, ms)
      .write.parquet(s"$state/v=1")
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$state/v=1/_SUCCESS"), false)
    val seen = StreamingPipeline.currentMetrics(spark, state)
      .orderBy("event_type", "day").collect().toSeq
    assert(seen == committed,
      "torn version leaked into reads — wrong-answer window until replay")

    // the checkpoint replays batch 1: overwrite of the wreckage lands
    // the full answer
    StreamingPipeline.metricStateBatch(rest, state, dims, ms, batchId = 1L)
    val replayed = StreamingPipeline.currentMetrics(spark, state)
      .orderBy("event_type", "day").collect().toSeq
    assert(replayed == oneShot)
  }

  test("HLL distinct partial: batch-merged estimate equals one-shot, within 2% of exact") {
    val ev = events.withColumn("uid", col("value").cast("long") % 500)
    val dd = Seq(MetricState.Measure("uid", "uid"))
    val grp = Seq("event_type")
    def est(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type").collect()
        .map(r => r.getString(0) -> r.getAs[Number](r.length - 1).longValue).toSeq
    val one = est(MetricState.render(MetricState.buildState(ev, grp, Nil, dd)))
    val batches = Seq(ev.filter(col("value") < 50),
      ev.filter(col("value") >= 50))
    val merged = est(MetricState.render(MetricState.mergeStates(
      batches.map(b => MetricState.buildState(b, grp, Nil, dd)))))
    assert(merged == one, "sketch union must be split-invariant here")
    val exact = ev.groupBy("event_type").agg(countDistinct(col("uid")).as("d"))
      .orderBy("event_type").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (k, e) =>
      val x = exact(k)
      assert(math.abs(e - x).toDouble / x <= 0.02, s"$k: est $e exact $x")
    }
  }

  test("histogram percentile partials: batch-merged read-out equals HistogramSketch") {
    val ev = events
    val h = MetricState.Hist("value", "value", 0.0, 1000.0)
    val grp = Seq("event_type")
    val batches = Seq(
      ev.filter(col("day") < to_date(lit("2024-01-10"))),
      ev.filter(col("day") >= to_date(lit("2024-01-10"))
        && col("day") < to_date(lit("2024-01-20"))),
      ev.filter(col("day") >= to_date(lit("2024-01-20"))))
    val merged = MetricState.render(
      MetricState.mergeStates(batches.map(b =>
        MetricState.buildState(b, grp, Nil, Nil, Seq(h)))), Seq(h))
      .orderBy("event_type")
      .select("event_type", "value_p50", "value_p95").collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val ref = graft.llm.HistogramSketch.estimate(ev, "value", "event_type",
      0.0, 1000.0, MetricState.histBins, Seq(("p50", 0.5), ("p95", 0.95)))
      .orderBy("grp").collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(merged == ref,
      "incremental histogram partials must reproduce the one-shot sketch exactly")
  }

  test("KMV partials: merged state sketch equals one-shot; cross-period overlap from state alone") {
    import graft.llm.KmvSketch
    val ev = events.withColumn("uid", col("value").cast("long") % 300)
    val kd = Seq(MetricState.Measure("uid", "uid"))
    val grp = Seq("event_type")
    val cut = to_date(lit("2024-01-16"))
    val a = MetricState.buildState(ev.filter(col("day") < cut), grp, Nil, Nil, Nil, kd)
    val b = MetricState.buildState(ev.filter(col("day") >= cut), grp, Nil, Nil, Nil, kd)
    // split-invariance: merged sketch state == one-shot sketch state
    val merged = MetricState.mergeStates(Seq(a, b))
      .orderBy("event_type").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toSeq
    val oneShotK = MetricState.buildState(ev, grp, Nil, Nil, Nil, kd)
      .orderBy("event_type").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toSeq
    assert(merged == oneShotK)
    // the question plain state tables cannot answer: per event_type,
    // uids active in BOTH halves of the month — straight off the two
    // period-state sketches, no raw rows
    val overlap = a.select(col("event_type"), col("uid__pkmv").as("ska"))
      .join(b.select(col("event_type"), col("uid__pkmv").as("skb")), "event_type")
      .select(col("event_type"),
        KmvSketch.intersectEstimate(col("ska"), col("skb")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = ev.filter(col("day") < cut).select(col("event_type"), col("uid"))
      .distinct().as("x")
      .join(ev.filter(col("day") >= cut).select(col("event_type"), col("uid"))
        .distinct().as("y"), Seq("event_type", "uid"))
      .groupBy("event_type").agg(countDistinct(col("uid")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, x) =>
      val e = overlap(k)
      assert(math.abs(e - x) / x <= 0.25, s"$k: overlap est $e exact $x")
    }
  }

  test("merge never narrows __psum: overflow-sized decimals stay non-null") {
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    // two state frames whose __psum columns landed as DECIMAL(30,6)
    // (an older writer / external tool): each holds ~9e23, the merged
    // sum 1.8e24 exceeds DECIMAL(30,6) capacity — a merge that casts
    // the widened sum back to the input type silently NULLs it
    val mk = (v: String) => Seq(("a", v))
      .toDF("event_type", "x")
      .select(col("event_type"),
        col("x").cast(DecimalType(30, 6)).as("m__psum"),
        lit(1L).as("m__pcnt"),
        lit(1.0).as("m__pmin"), lit(1.0).as("m__pmax"))
    val merged = MetricState.mergeStates(
      Seq(mk("900000000000000000000000"), mk("900000000000000000000000")))
    val sumRow = merged.select("m__psum").collect().head
    assert(!sumRow.isNullAt(0), "merged __psum overflowed to NULL")
    assert(sumRow.getDecimal(0).toBigInteger.toString
      == "1800000000000000000000000")
    // and the rendered read-out carries it through
    val r = MetricState.render(merged).select("m_sum").collect().head
    assert(math.abs(r.getDouble(0) - 1.8e24) / 1.8e24 < 1e-9)
  }

  test("histogram percentile of an all-null group renders NULL, not lo") {
    import spark.implicits._
    val h = MetricState.Hist("value", "value", 0.0, 1000.0)
    val df = Seq(
      ("a", Some(100.0)), ("a", Some(900.0)),
      ("b", None: Option[Double])).toDF("event_type", "value")
    val out = MetricState.render(
      MetricState.buildState(df, Seq("event_type"), Nil, Nil, Seq(h)),
      Seq(h)).orderBy("event_type").collect()
    assert(!out(0).isNullAt(out(0).fieldIndex("value_p50")))
    assert(out(1).isNullAt(out(1).fieldIndex("value_p50")),
      "empty histogram must not fabricate the lo edge as a percentile")
    assert(out(1).isNullAt(out(1).fieldIndex("value_p95")))
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
