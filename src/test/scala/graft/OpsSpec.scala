package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.ops.MiscOps
import graft.sources.Tables

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asof join: each left row gets the latest right row at-or-before") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 50L, "x"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 8L, "r8"), (1L, 15L, "r15"), (2L, 60L, "r60"))
      .toDF("k", "t", "tag")
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.asOf(left, "k", "t", right, "k", "rt", Seq("tag", "rt"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("tag"))).toMap
    assert(out == Map("e1" -> "r8", "e2" -> "r15"))
    // e0 (t=5, before first right) and x (right only after) are dropped
  }

  test("asof join: inclusive at equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, "exact")).toDF("k", "rt", "tag")
      .select(col("k"), col("rt"), col("tag"))
    val out = AsOfJoin.asOf(left, "k", "t", right, "k", "rt", Seq("tag"))
    assert(out.collect().head.getAs[String]("tag") == "exact")
  }

  test("asof join on real tables matches a scalar reference check") {
    // markers = error events; left = other events of same users
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    val markers = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id").as("m_user"), col("ts").as("m_ts"))
      .agg(max(col("event_id")).as("marker_id"))
    val left = ev.filter(col("event_type") =!= "error").limit(200)
    val joined = AsOfJoin.asOf(left, "user_id", "ts",
      markers, "m_user", "m_ts", Seq("marker_id", "m_ts"))
    val rows = joined.collect()
    assert(rows.nonEmpty)
    // spot-check: the matched marker is really the latest at-or-before
    val mLocal = markers.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    for (r <- rows.take(20)) {
      val u = r.getAs[Long]("user_id"); val t = r.getAs[java.sql.Timestamp]("ts")
      val expect = mLocal.filter(m => m._1 == u && !m._2.after(t))
        .sortBy(m => (m._2.getTime, m._3)).lastOption.map(_._3)
      assert(expect.contains(r.getAs[Long]("marker_id")))
    }
  }

  test("observe: row count collected as a side product of the action") {
    val df = Tables.load(spark, TestSpark.sfDir, "orders")
    val (observed, obs) = MiscOps.withObservedCount(df.filter(col("o_totalprice") > 0))
    val n = observed.count()
    assert(obs.get("n_rows").asInstanceOf[Long] == n)
  }

  test("health probe: up for real table, typed failure for missing") {
    MiscOps.checkSourceUp(spark, s"${TestSpark.sfDir}/orders.parquet")
    val ex = intercept[MiscOps.SourceDown] {
      MiscOps.checkSourceUp(spark, "/nonexistent/nowhere.parquet")
    }
    assert(ex.path.contains("nowhere"))
  }

  test("type names mapping") {
    val m = MiscOps.columnTypeNames(Tables.load(spark, TestSpark.sfDir, "orders"))
    assert(m("o_orderkey") == "bigint")
    assert(m("o_orderdate").startsWith("timestamp")) // parquet NTZ → timestamp_ntz
  }

  test("connection registry is idempotent") {
    val reg = new MiscOps.ConnectionRegistry(spark)
    assert(reg.createIfAbsent("wh1", "jdbc", "WH1_SECRET"))
    assert(!reg.createIfAbsent("wh1", "jdbc", "WH1_SECRET"))
    assert(reg.get("wh1").contains(("jdbc", "WH1_SECRET")))
    assert(reg.get("nope").isEmpty)
  }

  test("burstDetect: planted spike flags, cold start and constant baseline never do") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int, k: Int) = // k events inside hour h
      (0 until k).map(i => (new java.sql.Timestamp(
        t0.getTime + h * 3600000L + i * 1000L), "click"))
    // 30 alternating 9/11 hours (var > 0), then a 100-event spike,
    // plus a SECOND type with a CONSTANT baseline and the same spike
    val rows = (0 until 30).flatMap(h => at(h, if (h % 2 == 0) 9 else 11)) ++
      at(30, 100) ++
      ((0 until 30).flatMap(h => at(h, 10)) ++ at(30, 100))
        .map { case (ts, _) => (ts, "view") }
    val out = graft.ops.EventOps.burstDetect(rows.toDF("ts", "event_type"))
      .orderBy("event_type", "hour").collect()
    val click = out.filter(_.getString(0) == "click")
    val view = out.filter(_.getString(0) == "view")
    assert(click.length == 31 && view.length == 31)
    // cold start: the first minHist hours have z = null, burst = false
    assert(click.take(8).forall(r => r.isNullAt(r.fieldIndex("z"))
      && !r.getAs[Boolean]("burst")))
    // the spike hour: trailing window is the 24 hours before it —
    // mean 10, sd sqrt(24/23); z = 90/sd ~ 88 -> flagged
    val spike = click.last
    assert(spike.getAs[Long]("n_events") == 100L)
    assert(math.abs(spike.getAs[Double]("base_mean") - 10.0) < 1e-12)
    assert(spike.getAs[Double]("z") > 80.0 && spike.getAs[Boolean]("burst"))
    // no other click hour flags (|z| of a 9/11 wiggle is ~1)
    assert(click.init.forall(!_.getAs[Boolean]("burst")))
    // constant baseline: zero variance -> null z, never a flag, even
    // at the spike (the degenerate-baseline contract)
    assert(view.forall(r => r.isNullAt(r.fieldIndex("z"))
      && !r.getAs[Boolean]("burst")))
    assert(math.abs(view.last.getAs[Double]("base_mean") - 10.0) < 1e-12)
  }

  test("burstDetect: silent hours exist on the densified spine and an outage scores negative z") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int, k: Int) =
      (0 until k).map(i => (new java.sql.Timestamp(
        t0.getTime + h * 3600000L + i * 1000L), "click"))
    // 30 alternating 9/11 hours, 24 hours of TOTAL silence, then one
    // event at hour 54 (so the spine extends through the gap)
    val rows = (0 until 30).flatMap(h => at(h, if (h % 2 == 0) 9 else 11)) ++
      at(54, 1)
    val out = graft.ops.EventOps.burstDetect(rows.toDF("ts", "event_type"))
      .orderBy("hour").collect()
    // spine is dense: 55 hourly rows even though 24 emitted no events
    assert(out.length == 55, s"expected dense spine, got ${out.length}")
    val gap = out(30) // first silent hour
    assert(gap.getAs[Long]("n_events") == 0L)
    // its baseline is the REAL trailing 24 hours (mean 10, sd ~1):
    // the outage scores z ~ -10, visible and negative, never flagged
    assert(math.abs(gap.getAs[Double]("base_mean") - 10.0) < 1e-12)
    assert(gap.getAs[Double]("z") < -3.0 && !gap.getAs[Boolean]("burst"))
    // past the gap the trailing 24 hours are ALL zero -> variance 0
    // -> null z (degenerate), but the row is present on the spine
    val deep = out(54)
    assert(deep.getAs[Long]("n_events") == 1L)
    assert(deep.isNullAt(deep.fieldIndex("z")))
  }

  test("cusumShift: sustained small shift alarms where the z-gate stays silent; equals the recursive fold") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    def at(day: Int, typ: String, n: Int) = (0 until n).map(i =>
      (new java.sql.Timestamp(t0.getTime + day * 86400000L + i * 1000L), typ))
    // "drift": 20 days at 100 ± 2 (alternating), then 15 days at 112 —
    // a ~1.9-sd sustained shift no single day of which is a 3-sd burst
    val drift = (0 until 20).flatMap(d =>
      at(d, "drift", if (d % 2 == 0) 98 else 102)) ++
      (20 until 35).flatMap(d => at(d, "drift", 112))
    // "spike": noisy 98/102 baseline with ONE 110 day — z trips
    // (~3.7 sd) but the CUSUM jump is z−k ≈ 3.2 < h and decays (a
    // huge single spike legitimately CAN alarm: one 6-sd observation
    // IS shift evidence — hence the calibrated 110, not 150)
    val spike = (0 until 35).flatMap(d =>
      at(d, "spike", if (d == 17) 110 else if (d % 2 == 0) 98 else 102))
    val out = graft.ops.EventOps.cusumShift(
      (drift ++ spike).toDF("ts", "event_type"), k = 0.5, h = 4.0)
      .orderBy("event_type", "day").collect()
    val (dr, sp) = out.partition(_.getString(0) == "drift")
    // no single drift day is a 3-sd burst...
    assert(dr.forall(r => math.abs(r.getAs[Double]("z")) < 3.0))
    // ...but the CUSUM accumulates: the shifted era alarms on the
    // POSITIVE side (and, two-sided vs the blended target, the long
    // low era may alarm negative later on — expected semantics)
    assert(dr.filter(_.getDate(1).toString >= "2024-05-21")
      .exists(r => r.getAs[Boolean]("alarm") &&
        r.getAs[Double]("cusum_pos") > 4.0),
      "sustained shift must alarm on the positive side")
    // accumulation takes time: the first week cannot alarm
    assert(dr.take(7).forall(!_.getAs[Boolean]("alarm")),
      "alarms need accumulation")
    // the spike's own day trips z but the CUSUM never crosses h
    assert(sp.exists(r => r.getAs[Double]("z") > 3.0))
    assert(sp.forall(!_.getAs[Boolean]("alarm")),
      "a one-day spike must not CUSUM-alarm")
    // closed form == the literal recursive fold, per type
    for ((_, rows) <- out.groupBy(_.getString(0))) {
      var s = 0.0
      rows.sortBy(_.getDate(1).toString).foreach { r =>
        s = math.max(0.0, s + r.getAs[Double]("z") - 0.5)
        assert(math.abs(r.getAs[Double]("cusum_pos") - s) < 1e-9,
          s"closed form diverged at ${r.getDate(1)}")
      }
    }
  }

  test("ewmaChart: equals the textbook recursion, drift alarms, startup limits tighten") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    def at(day: Int, typ: String, n: Int) = (0 until n).map(i =>
      (new java.sql.Timestamp(t0.getTime + day * 86400000L + i * 1000L), typ))
    // drift: 20 days ~100, then 15 days at 112 (the cusum fixture)
    val drift = (0 until 20).flatMap(d =>
      at(d, "drift", if (d % 2 == 0) 98 else 102)) ++
      (20 until 35).flatMap(d => at(d, "drift", 112))
    // stable: alternating 98/102 forever — never leaves the band
    val stable = (0 until 35).flatMap(d =>
      at(d, "stable", if (d % 2 == 0) 98 else 102))
    // flat: constant volume → sd = 0 → null limits, no alarm
    val flat = (0 until 5).flatMap(d => at(d, "flat", 7))
    val out = graft.ops.EventOps.ewmaChart(
      (drift ++ stable ++ flat).toDF("ts", "event_type"),
      lambda = 0.2, nSigma = 3.0, maxLag = 64)
      .orderBy("event_type", "day").collect()
    val byType = out.groupBy(_.getString(0))
    // closed form == the literal recursion (maxLag 64 > 35 days)
    for ((_, rows) <- byType if rows.length >= 2) {
      val xs = rows.map(_.getLong(2).toDouble)
      val mu = xs.sum / xs.length
      var z = mu
      rows.zip(xs).foreach { case (r, x) =>
        z = 0.2 * x + 0.8 * z
        assert(math.abs(r.getAs[Double]("ewma") - z) < 1e-9,
          s"recursion diverged at ${r.getDate(1)}: ${r.getAs[Double]("ewma")} vs $z")
      }
    }
    val dr = byType("drift")
    assert(dr.filter(_.getDate(1).toString >= "2024-05-21")
      .exists(_.getAs[Boolean]("alarm")), "sustained drift must alarm")
    assert(byType("stable").forall(!_.getAs[Boolean]("alarm")),
      "stable series must stay inside the band")
    // startup: limits widen monotonically toward the asymptote
    val hws = dr.map(r => r.getAs[Double]("ucl") - r.getAs[Double]("lcl"))
    assert(hws.head < hws.last, "startup band must be tighter")
    assert(hws.zip(hws.tail).forall { case (a, b) => a <= b + 1e-12 })
    val fl = byType("flat")
    assert(fl.forall(r => r.isNullAt(4) && r.isNullAt(5) &&
      !r.getAs[Boolean]("alarm")), "sd=0 series: null limits, no alarm")
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.ewmaChart(flat.toDF("ts", "event_type"),
        lambda = 1.0)
    }
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.ewmaChart(flat.toDF("ts", "event_type"),
        maxLag = 0)
    }
  }

  test("kaplanMeier: hand curve with censoring, exhausted risk set pins survival to zero") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def ev(u: Long, days: Seq[Int]) = days.map(d =>
      (new java.sql.Timestamp(t0.getTime + d * 86400000L), u))
    // maxDay = 20; lifetimes: 1c,3z,6c,6c,6c,10c,11z (c=churn, z=censored)
    val events = (ev(1L, Seq(0, 5)) ++ ev(2L, Seq(0, 2, 5)) ++
      ev(3L, Seq(2, 7)) ++ ev(4L, Seq(0, 9)) ++ ev(5L, Seq(10, 15, 20)) ++
      ev(6L, Seq(16, 18)) ++ ev(7L, Seq(1))).toDF("ts", "user_id")
    val out = graft.ops.EventOps.kaplanMeier(events, quietDays = 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Double]("survival")))).toMap
    assert(out.keySet == Set(1L, 3L, 6L, 10L, 11L))
    assert(out(1L) == ((7L, 1L, 0L, out(1L)._4)))
    assert(math.abs(out(1L)._4 - 6.0 / 7) < 1e-9)
    // censor-only time: risk set shrinks, survival carries forward
    assert(out(3L)._1 == 6L && out(3L)._2 == 0L && out(3L)._3 == 1L)
    assert(math.abs(out(3L)._4 - 6.0 / 7) < 1e-9)
    assert(out(6L)._1 == 5L && out(6L)._2 == 3L)
    assert(math.abs(out(6L)._4 - 12.0 / 35) < 1e-9)
    assert(out(10L)._1 == 2L && math.abs(out(10L)._4 - 6.0 / 35) < 1e-9)
    assert(out(11L)._1 == 1L && out(11L)._3 == 1L)
    assert(math.abs(out(11L)._4 - 6.0 / 35) < 1e-9)
    // every at-risk user churns at the last time → survival EXACTLY 0
    // (u2 holds the observation-end day so u3's lifetime-3 churn
    // exhausts the risk set at t=3)
    val dead = (ev(1L, Seq(0)) ++ ev(2L, Seq(1)) ++ ev(3L, Seq(-3, -1)))
      .toDF("ts", "user_id")
    val dr = graft.ops.EventOps.kaplanMeier(dead, quietDays = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("survival"))
      .toMap
    assert(math.abs(dr(1L) - 2.0 / 3) < 1e-9)
    assert(dr(3L) == 0.0, "exhausted risk set must pin survival to 0")
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.kaplanMeier(dead, quietDays = 0)
    }
  }

  test("madOutliers: hand medians, modified z, degenerate group never flags") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-08-01 00:00:00")
    // odd group "a": med 3, ad sorted [0,1,1,2,97] -> mad 1;
    // mz(100) = 0.6745*97 flags, mz(1) = -1.349 does not.
    // even group "b": [1,2,3,4] -> med 2.5, ad [1.5,.5,.5,1.5] -> mad 1.0.
    // constant group "c": mad 0 -> null mz, never flags.
    val rows =
      Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
        (i.toLong + 1, t0, 1L, "a", v) } ++
      Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
        (i.toLong + 10, t0, 1L, "b", v) } ++
      (0 until 3).map(i => (i.toLong + 20, t0, 1L, "c", 5.0))
    val out = graft.ops.EventOps.madOutliers(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val big = out(5L)
    assert(big.getAs[Double]("med") == 3.0 && big.getAs[Double]("mad") == 1.0)
    assert(math.abs(big.getAs[Double]("mz") - 0.6745 * 97.0) < 1e-9)
    assert(big.getAs[Boolean]("outlier"))
    assert(!out(1L).getAs[Boolean]("outlier") &&
      math.abs(out(1L).getAs[Double]("mz") + 0.6745 * 2.0) < 1e-9)
    assert(out(10L).getAs[Double]("med") == 2.5 &&
      out(10L).getAs[Double]("mad") == 1.0)
    assert(out(20L).getAs[Double]("mad") == 0.0 &&
      out(20L).isNullAt(out(20L).fieldIndex("mz")) &&
      !out(20L).getAs[Boolean]("outlier"))
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.madOutliers(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
        cut = 0.0)
    }
  }

  test("markov: hand transition matrix and stationary occupancy with dangling redistribution") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-08-01 00:00:00")
    def ev(id: Long, user: Long, sec: Int, typ: String) =
      (id, new java.sql.Timestamp(t0.getTime + sec * 1000L), user, typ, 1.0)
    // user 1: A->B->A->B; user 2: A->C. From A: {B:2, C:1}; from B: {A:1}; C dangling.
    val events = Seq(
      ev(1L, 1L, 0, "A"), ev(2L, 1L, 1, "B"), ev(3L, 1L, 2, "A"),
      ev(4L, 1L, 3, "B"), ev(5L, 2L, 0, "A"), ev(6L, 2L, 1, "C"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val tr = graft.ops.EventOps.markovTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(tr.keySet == Set(("A", "B"), ("A", "C"), ("B", "A")), tr.toString)
    assert(tr(("A", "B"))._1 == 2L && math.abs(tr(("A", "B"))._2 - 2.0 / 3) < 1e-12)
    assert(tr(("A", "C"))._1 == 1L && math.abs(tr(("A", "C"))._2 - 1.0 / 3) < 1e-12)
    assert(tr(("B", "A"))._1 == 1L && tr(("B", "A"))._2 == 1.0)
    // one power iteration from uniform: dang = pi(C) = 1/3;
    // flow: A <- pi(B)*1 = 1/3, B <- pi(A)*2/3 = 2/9, C <- pi(A)*1/3 = 1/9;
    // +dang/3 = +1/9 each -> A 4/9, B 1/3, C 2/9 (sums to 1)
    val pi1 = graft.ops.EventOps.markovStationary(events, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pi1("A") - 4.0 / 9) < 1e-9, pi1.toString)
    assert(math.abs(pi1("B") - 1.0 / 3) < 1e-9)
    assert(math.abs(pi1("C") - 2.0 / 9) < 1e-9)
    assert(math.abs(pi1.values.sum - 1.0) < 1e-9, "mass conserved")
    // more iterations keep conservation and stay deterministic
    val pi3 = graft.ops.EventOps.markovStationary(events, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pi3.values.sum - 1.0) < 1e-9)
    val pi3b = graft.ops.EventOps.markovStationary(events, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pi3 == pi3b, "deterministic")
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.markovStationary(events, iters = 0)
    }
  }

  test("mannKendall: monotone series flags, constant/alternating do not, tie-corrected variance") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-08-01 00:00:00")
    def at(day: Int, typ: String, n: Int) = (0 until n).map(i =>
      (new java.sql.Timestamp(t0.getTime + day * 86400000L + i * 1000L), typ))
    val rising = (0 until 10).flatMap(d => at(d, "up", d + 1))
    val flat = (0 until 10).flatMap(d => at(d, "flat", 5))
    val alt = (0 until 10).flatMap(d => at(d, "alt", if (d % 2 == 0) 4 else 6))
    val out = graft.ops.EventOps.mannKendall(
      (rising ++ flat ++ alt).toDF("ts", "event_type"))
      .collect().map(r => r.getString(0) -> r).toMap
    // strictly rising: S = 45, Var = 10*9*25/18 = 125, z = 44/√125
    val up = out("up")
    assert(up.getAs[Long]("s_stat") == 45L)
    assert(math.abs(up.getAs[Double]("var_s") - 125.0) < 1e-9)
    assert(math.abs(up.getAs[Double]("z") - 44.0 / math.sqrt(125.0)) < 1e-9)
    assert(up.getAs[Boolean]("trend"))
    // constant: all tied → Var = 0 → null z, no trend
    val fl = out("flat")
    assert(fl.getAs[Long]("s_stat") == 0L &&
      fl.getAs[Double]("var_s") == 0.0)
    assert(fl.isNullAt(4) && !fl.getAs[Boolean]("trend"))
    // alternating two values: S ≈ 0; tie correction = 2 groups of 5:
    // Var = (2250 - 2*5*4*15)/18 = 1650/18
    val al = out("alt")
    assert(math.abs(al.getAs[Double]("var_s") - 1650.0 / 18) < 1e-9)
    assert(!al.getAs[Boolean]("trend"), s"alternating z = ${al.get(4)}")
    intercept[IllegalArgumentException] {
      graft.ops.EventOps.mannKendall(flat.toDF("ts", "event_type"),
        zCrit = 0.0)
    }
  }

  test("tableDiff: added/removed/changed/unchanged, null-safe changes, one-sided columns ignored") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, Some("c"), 30),
      (4L, None: Option[String], 40)).toDF("k", "v", "w")
    val after = Seq(
      (1L, Some("a"), 10),                       // unchanged
      (3L, Some("CHANGED"), 30),                 // value change
      (4L, Some("now-set"), 40),                 // null -> value change
      (5L, Some("new"), 50))                     // added
      .toDF("k", "v", "w")
      .withColumn("extra", lit("only-after"))    // one-sided: ignored
    val out = graft.ops.TableDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "removed", 3L -> "changed",
      4L -> "changed", 5L -> "added"), out.toString)
    val withU = graft.ops.TableDiff.diff(before, after, Seq("k"),
      includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(withU(1L) == "unchanged" && withU.size == 5)
    intercept[IllegalArgumentException] {
      graft.ops.TableDiff.diff(before, after, Seq("missing"))
    }
    intercept[IllegalArgumentException] {
      graft.ops.TableDiff.diff(before, after, Nil)
    }
  }

  test("profiler: counts, lexicographic bounds, smallest-tie top value, all-null column kept") {
    import spark.implicits._
    val df = Seq(
      (Some("b"), Some(2)), (Some("b"), Some(10)),
      (Some("a"), Some(2)), (None: Option[String], None: Option[Int]))
      .toDF("s", "n")
      .withColumn("allnull", lit(null).cast("string"))
    val out = graft.ops.Profiler.profile(df)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = out("s")
    assert(s.getAs[Long]("n_rows") == 4L && s.getAs[Long]("n_nonnull") == 3L)
    assert(s.getAs[Long]("n_distinct") == 2L)
    assert(s.getAs[String]("min_str") == "a" &&
      s.getAs[String]("max_str") == "b")
    assert(s.getAs[String]("top_value") == "b" &&
      s.getAs[Long]("top_count") == 2L)
    // numeric renders lexicographically: "10" < "2"
    val n = out("n")
    assert(n.getAs[String]("min_str") == "10" &&
      n.getAs[String]("max_str") == "2")
    assert(n.getAs[String]("top_value") == "2", "tie breaks to smallest")
    val an = out("allnull")
    assert(an.getAs[Long]("n_nonnull") == 0L && an.isNullAt(6),
      "all-null column keeps its row with null top")
  }

  test("theilSenTrend: exact planted slope/intercept, outlier-robust where OLS is not, even-count median") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-07-01 00:00:00")
    def at(day: Int, typ: String, n: Int) = (0 until n).map(i =>
      (new java.sql.Timestamp(t0.getTime + day * 86400000L + i * 1000L), typ))
    // clean line x = 2t + 5 over 10 days (even count exercises the
    // two-middle average)
    val lin = (0 until 10).flatMap(d => at(d, "lin", 2 * (d + 1) + 5))
    // same line with ONE massive outlier day — the median slope must
    // not move (29 of 435 pair slopes touch the spike)
    val out = (0 until 10).flatMap(d =>
      at(d, "outlier", if (d == 4) 500 else 2 * (d + 1) + 5))
    val r = graft.ops.EventOps.theilSenTrend(
      (lin ++ out).toDF("ts", "event_type"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r("lin")._1 == 10L)
    assert(math.abs(r("lin")._2 - 2.0) < 1e-12, s"slope ${r("lin")._2}")
    assert(math.abs(r("lin")._3 - 5.0) < 1e-12, s"intercept ${r("lin")._3}")
    assert(math.abs(r("outlier")._2 - 2.0) < 1e-12,
      s"outlier day must not move the median slope: ${r("outlier")._2}")
    assert(math.abs(r("outlier")._3 - 5.0) < 1e-12)
  }

  test("rollingActiveUsers: equals brute-force rolling distinct, silent days at zero") {
    import spark.implicits._
    // user 1: days 0,1,9; user 2: day 0 only; user 3: days 4..5 —
    // with w=3 this exercises re-activity inside the window (no
    // double count), expiry, a silent-day gap (days 8 with nobody
    // active under w=3), and multi-event days (dedup)
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def at(day: Int, u: Long, k: Int) = (0 until k).map(i =>
      (new java.sql.Timestamp(t0.getTime + day * 86400000L + i * 1000L), u))
    val rows = at(0, 1L, 3) ++ at(1, 1L, 1) ++ at(9, 1L, 2) ++
      at(0, 2L, 1) ++ at(4, 3L, 1) ++ at(5, 3L, 2)
    val out = graft.ops.EventOps.rollingActiveUsers(
      rows.toDF("ts", "user_id"), windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    // brute force: distinct users with an activity day in [d-2, d]
    val acts = Map(1L -> Set(0, 1, 9), 2L -> Set(0), 3L -> Set(4, 5))
    val want = (0 to 9).map { d =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(d).toString
      day -> acts.count { case (_, ds) =>
        ds.exists(a => a <= d && a > d - 3) }.toLong
    }
    assert(out.toSeq == want.toSeq)
    // the spine is dense: day 8 exists with zero actives
    assert(out(8)._2 == 0L)
  }
}
