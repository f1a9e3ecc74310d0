package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream anomaly readouts for pipeline observability. */
object EventOps {

  /** Hourly burst detection per event type: each hour's count scored
    * as a z-score against the TRAILING `lookback`-hour window (the
    * hour itself excluded — a burst must not dilute its own
    * baseline). The ingestion-observability gate beside the drift
    * family (TVD/PSI watch content; this watches VOLUME): a crawler
    * gone hot, a source replaying itself, or an upstream outage
    * (negative z) all show here first.
    *
    * The hour spine is DENSIFIED per type (every hour between the
    * type's first and last observed hour exists, zero-count if
    * silent): a ROWS window over observed hours only would stretch
    * "trailing 24 hours" across arbitrary gaps, and a full outage
    * hour would emit no row at all — exactly the hour the monitor
    * must score (it shows as the negative-z row).
    *
    * Flag rule: z > `zCut` with at least `minHist` trailing hours of
    * history (cold-start hours and degenerate zero-variance baselines
    * emit null z, never a flag).
    *
    * Determinism: trailing sums run as exact aggregates — the count
    * sum in BIGINT, the square sum in DECIMAL(38,0) (counts to ~1e9/
    * hour square past 2^63; the pmiPairs lesson) — and mean/var/z are
    * single IEEE expressions of those exact values, with the variance
    * clamped at 0 before the sqrt (fp cancellation on a constant
    * baseline lands epsilon-negative, the q192 discipline).
    *
    * Scale shape: the data-sized work is ONE map-side-combined
    * (type, hour) count; the spine explode and every window run on
    * the aggregate series — |types|·|hours| rows, thousands even at
    * 100 TB/year — partitioned by type. Zero corpus-sized shuffles
    * beyond the count. */
  def burstDetect(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", lookback: Int = 24,
      minHist: Int = 8, zCut: Double = 3.0): DataFrame = {
    require(lookback >= 2 && minHist >= 2 && minHist <= lookback,
      s"need 2 <= minHist <= lookback, got lookback=$lookback minHist=$minHist")
    val counts = events
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val spine = counts.groupBy(col(typeCol))
      .agg(min(col("hour")).as("__h0"), max(col("hour")).as("__h1"))
      .select(col(typeCol),
        explode(sequence(col("__h0"), col("__h1"),
          expr("interval 1 hour"))).as("hour"))
    val hourly = spine.join(counts, Seq(typeCol, "hour"), "left")
      .na.fill(0L, Seq("n_events"))
    val w = Window.partitionBy(col(typeCol)).orderBy(col("hour"))
      .rowsBetween(-lookback, -1)
    val nH = count(lit(1)).over(w)
    val s1 = sum(col("n_events")).over(w)
    val s2 = sum(col("n_events").cast(DecimalType(38, 0)) * col("n_events"))
      .over(w)
    val nD = nH.cast("double")
    val mean = s1.cast("double") / nD
    val variance = greatest(
      (s2.cast("double") - nD * mean * mean) / (nD - lit(1.0)), lit(0.0))
    val z = when(nH >= minHist && variance > 0.0,
      (col("n_events").cast("double") - mean) / sqrt(variance))
    hourly.select(col(typeCol), col("hour"), col("n_events"),
      nH.cast("long").as("n_hist"),
      when(nH >= 1, mean).as("base_mean"),
      z.as("z"),
      coalesce(z > zCut, lit(false)).as("burst"))
  }

  /** CUSUM level-shift detection on daily event volume per type
    * (Page 1954): the sequential change-point statistic that catches
    * what [[burstDetect]]'s z-score cannot — a SUSTAINED small shift.
    * A +15% volume drift flags no single hour (every z is ~0.4) but
    * accumulates in S⁺ within days; conversely a one-hour spike that
    * trips z barely moves the CUSUM. Production monitors run both.
    *
    * Statistic: z_d standardized against the series' own mean/sd
    * (the two-pass target-value convention), slack k in sd units,
    * S⁺_d = max(0, S⁺_{d−1} + z_d − k), S⁻ mirrored; alarm when
    * either exceeds `h`.
    *
    * The recursion is computed WITHOUT recursion: max(0, ·)-folded
    * sums have the closed form S_d = C_d − min(0, min_{j≤d} C_j)
    * with C the plain running sum of (z − k) — so the whole detector
    * is two chained windows (running sum, then running min) per
    * side, type-partitioned over the DENSE day spine: distributed,
    * engine-portable, and replayed verbatim by the DuckDB oracle.
    * Cross-engine drift is bounded at summation-reassociation ulps
    * (DuckDB may tree-sum a window frame) — orders of magnitude
    * inside the gate's 1e-9 rounding on O(1)-scale statistics.
    *
    * Degenerate series (sd = 0 or < 2 days) emit null z/cusum and
    * never alarm.
    *
    * Scale shape: the data-sized work is ONE map-side-combined
    * (type, day) count; spine densify, moments, and all four windows
    * run on the |types|·|days| aggregate series (the burstDetect
    * argument). */
  def cusumShift(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", k: Double = 0.5,
      h: Double = 4.0): DataFrame = {
    require(k >= 0 && h > 0, s"need k >= 0 and h > 0, got k=$k h=$h")
    val counts = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = counts.groupBy(col(typeCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(typeCol),
        explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as("day"))
    val daily = spine.join(counts, Seq(typeCol, "day"), "left")
      .na.fill(0L, Seq("n_events"))
    cusumOnSeries(daily, typeCol, "day", "n_events", k, h)
  }

  /** The CUSUM detector body over an ALREADY-AGGREGATED series frame
    * — shared by [[cusumShift]] (daily event volume, dense day spine)
    * and the streaming epoch variant
    * ([[graft.streaming.StreamingPipeline.epochCusum]], committed
    * ingest epochs). Series are independent per `keyCol`, ordered by
    * `ordCol`; moments use the exact-decimal fold; the Page recursion
    * is the closed-form two-chained-windows construction documented
    * on [[cusumShift]]. Degenerate series (sd = 0 or < 2 points)
    * emit null z/cusum and never alarm.
    * Output: (keyCol, ordCol, valCol, z, cusum_pos, cusum_neg, alarm)
    * — callers own spine semantics (densify or not) BEFORE calling. */
  private[graft] def cusumOnSeries(series: DataFrame, keyCol: String,
      ordCol: String, valCol: String, k: Double, h: Double): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    require(k >= 0 && h > 0, s"need k >= 0 and h > 0, got k=$k h=$h")
    // per-key target moments, exact sums (the burstDetect decimal
    // discipline) — |keys| rows, broadcast back
    // x² via the dsum discipline, not a scale-0 decimal cast: the
    // caller-supplied series may be fractional (see ewmaOnSeries —
    // same reasoning, same value-identical result for the current
    // integer-count callers). Exactness bound: the double product v*v
    // is exact only while |v| < 2^26.5 (~9.4e7); integer series beyond
    // that lose the last ulps the old DECIMAL(38,0) path kept — at
    // those magnitudes the z-scores are ratios of ~1e15 quantities and
    // the ulp is immaterial, but the bound is the contract
    val mom = series.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__nd"),
      sum(col(valCol)).as("__s1"),
      dsum(col(valCol).cast("double") * col(valCol).cast("double"), 12)
        .as("__s2"))
    val nD = col("__nd").cast("double")
    val mean = col("__s1").cast("double") / nD
    val variance = greatest(
      (col("__s2").cast("double") - nD * mean * mean) / (nD - lit(1.0)),
      lit(0.0))
    val withZ = series.join(broadcast(mom), Seq(keyCol))
      .withColumn("__z", when(col("__nd") >= 2L && variance > 0.0,
        (col(valCol).cast("double") - mean) / sqrt(variance)))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // two stages: the running sums first, then the running min OF the
    // running sums (windows cannot nest in one projection); same
    // partitioning + ordering, so the plan sorts once
    val staged = withZ
      .withColumn("__cp", sum(col("__z") - k).over(wRun))
      .withColumn("__cn", sum(lit(0.0) - col("__z") - k).over(wRun))
    val sPos = col("__cp") - least(lit(0.0), min(col("__cp")).over(wRun))
    val sNeg = col("__cn") - least(lit(0.0), min(col("__cn")).over(wRun))
    staged.select(col(keyCol), col(ordCol), col(valCol),
      col("__z").as("z"),
      sPos.as("cusum_pos"), sNeg.as("cusum_neg"),
      coalesce(sPos > h || sNeg > h, lit(false)).as("alarm"))
  }

  /** EWMA control chart on daily event volume per type (Roberts
    * 1959): the exponentially-weighted companion to [[cusumShift]] —
    * CUSUM is optimal for a step shift of known size (the slack k);
    * the EWMA chart tracks the level itself and flags when the
    * smoothed series leaves μ ± L·σ_z, catching slow drifts and
    * giving operators the smoothed trajectory, not just an alarm bit.
    * Production monitors run both (plus [[burstDetect]] for spikes).
    *
    * The recursion z_t = λ·x_t + (1−λ)·z_{t−1}, z_0 = μ is computed
    * WITHOUT recursion via its weighted-sum closed form, truncated at
    * `maxLag`: z_t = λ·Σ_{lag<min(t,maxLag)} (1−λ)^lag · x_{t−lag}
    * + (1−λ)^min(t,maxLag) · μ — the pre-window state is the target
    * mean, so weights total EXACTLY 1 and the truncated form equals
    * the textbook recursion whenever maxLag ≥ t (dropped terms are
    * ≤ (1−λ)^maxLag ≈ 6e-7 of a z-unit at the defaults). Control
    * limits use the exact-t variance inflation
    * σ_z(t) = σ·√(λ/(2−λ)·(1−(1−λ)^{2t})), so early days get the
    * tighter startup bound. Target μ, σ are the series' own moments
    * (the [[cusumShift]] two-pass convention); degenerate series
    * (σ = 0 or < 2 days) emit null limits and never alarm.
    *
    * Scale shape: the data-sized work is ONE map-side-combined
    * (type, day) count; the dense spine, moments, and the lag
    * self-join all live on the |types|·|days| aggregate series, and
    * the join emits ≤ maxLag rows per series point — bounded, keyed,
    * never data-sized. Weight terms decimal-round before the exact
    * sum (the dsum discipline) so the smoothed doubles hash
    * cross-engine. */
  def ewmaChart(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", lambda: Double = 0.2,
      nSigma: Double = 3.0, maxLag: Int = 64): DataFrame = {
    val counts = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = counts.groupBy(col(typeCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(typeCol),
        explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as("day"))
    val daily = spine.join(counts, Seq(typeCol, "day"), "left")
      .na.fill(0L, Seq("n_events"))
    ewmaOnSeries(daily, typeCol, "day", "n_events", lambda, nSigma, maxLag)
  }

  /** The EWMA-chart body over an ALREADY-AGGREGATED series frame —
    * shared by [[ewmaChart]] (daily event volume, dense day spine)
    * and the streaming epoch variant
    * ([[graft.streaming.StreamingPipeline.epochEwma]], committed
    * ingest epochs). The [[cusumOnSeries]] contract: series
    * independent per `keyCol`, ordered by `ordCol` (t = the 1-based
    * dense position, a per-key rank), callers own spine semantics
    * BEFORE calling; degenerate series (sd = 0 or < 2 points) emit
    * null limits and never alarm.
    * Output: (keyCol, ordCol, valCol, ewma, ucl, lcl, alarm). */
  private[graft] def ewmaOnSeries(series: DataFrame, keyCol: String,
      ordCol: String, valCol: String, lambda: Double,
      nSigma: Double, maxLag: Int): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    require(nSigma > 0, s"nSigma must be positive, got $nSigma")
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val daily = series.withColumn("__t",
      row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(col(ordCol))).cast("long"))
    // __s2 via the dsum discipline (each x² term decimal-rounded to
    // 12 places, summed exactly): the previous DECIMAL(38,0) cast
    // truncated FRACTIONAL series values, silently skewing the
    // variance and control limits if this helper were ever reused
    // beyond the current integer-count callers. For integer series
    // the x² terms are exact in double (< 2^53), round-trip the
    // 12-place rounding unchanged, and sum identically — so existing
    // gates hash the same values.
    val mom = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__nd"),
      sum(col(valCol)).as("__s1"),
      dsum(col(valCol).cast("double") * col(valCol).cast("double"), 12)
        .as("__s2"))
    val oml = lit(1.0 - lambda)
    val rhs = daily.select(col(keyCol), col("__t").as("__i"),
      col(valCol).as("__x"))
    val wsum = daily.join(rhs,
        daily(keyCol) === rhs(keyCol) &&
          col("__i") <= col("__t") && col("__i") > col("__t") - maxLag)
      .drop(rhs(keyCol))
      .groupBy(col(keyCol), col(ordCol), col("__t"), col(valCol))
      .agg(dsum(lit(lambda) * col("__x").cast("double") *
        pow(oml, (col("__t") - col("__i")).cast("double")), 12)
        .as("__wsum"))
    val nD = col("__nd").cast("double")
    val mu = col("__s1").cast("double") / nD
    val variance = greatest(
      (col("__s2").cast("double") - nD * mu * mu) / (nD - lit(1.0)),
      lit(0.0))
    val ewma = col("__wsum") +
      mu * pow(oml, least(col("__t"), lit(maxLag.toLong)).cast("double"))
    val halfWidth = when(col("__nd") >= 2L && variance > 0.0,
      lit(nSigma) * sqrt(variance) *
        sqrt(lit(lambda / (2.0 - lambda)) *
          (lit(1.0) - pow(oml, lit(2.0) * col("__t").cast("double")))))
    wsum.join(broadcast(mom), Seq(keyCol))
      .withColumn("ewma", ewma)
      .withColumn("ucl", mu + halfWidth)
      .withColumn("lcl", mu - halfWidth)
      .select(col(keyCol), col(ordCol), col(valCol), col("ewma"),
        col("ucl"), col("lcl"),
        coalesce(col("ewma") > col("ucl") || col("ewma") < col("lcl"),
          lit(false)).as("alarm"))
  }

  /** Kaplan-Meier survival curve over user lifetimes (Kaplan & Meier
    * 1958) — the churn readout [[graft.llm]] retention cohorts can't
    * give: cohorts report raw active fractions per calendar cell,
    * KM estimates the survival FUNCTION with censoring handled
    * correctly. A user's lifetime is last − first activity day + 1;
    * users still active inside the final `quietDays` window are
    * CENSORED (their churn is unobserved — they count in the risk
    * sets up to their observed lifetime but never as an event),
    * everyone else churned at their last activity.
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over observed lifetimes, nᵢ =
    * users with lifetime ≥ tᵢ. Emits one row per observed lifetime
    * (censor-only times carry survival forward).
    *
    * Determinism: the product is exp of the exact DECIMAL(30,12) sum
    * of ln factors (the dsum discipline); a zero factor (everyone at
    * risk churns) pins survival to exactly 0 from that time on — no
    * ln(0) enters the fold.
    *
    * Scale shape: ONE map-side-combined per-user (first, last) pass;
    * the curve lives on the |distinct lifetimes|-row aggregate frame
    * (bounded by the observation span in days) — its ordered windows
    * run there, never on data-sized rows. */
  def kaplanMeier(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", quietDays: Int = 7): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    require(quietDays >= 1, s"quietDays must be >= 1, got $quietDays")
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("__u"))
      .agg(min(to_date(col(tsCol))).as("__f"),
        max(to_date(col(tsCol))).as("__l"))
    val maxD = perUser.agg(max(col("__l")).as("__maxd"))
    val u = perUser.crossJoin(broadcast(maxD))
      .select((datediff(col("__l"), col("__f")) + 1).cast("long")
        .as("t_days"),
        (datediff(col("__maxd"), col("__l")) >= quietDays).as("__churn"))
    val byT = u.groupBy(col("t_days")).agg(
      count(lit(1)).cast("long").as("__m"),
      sum(col("__churn").cast("long")).cast("long").as("n_churned"),
      sum((!col("__churn")).cast("long")).cast("long").as("n_censored"))
    // ordered windows run on the |distinct lifetimes|-row aggregate
    // frame (bounded by the day span) — the sortedNeighborPairs offs
    // argument, acceptable unpartitioned
    val wPrev = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCur = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val staged = byT
      .crossJoin(broadcast(byT.agg(sum(col("__m")).cast("long").as("__N"))))
      .withColumn("n_risk",
        (col("__N") - coalesce(sum(col("__m")).over(wPrev), lit(0L)))
          .cast("long"))
      .withColumn("__factor",
        lit(1.0) - col("n_churned").cast("double") /
          col("n_risk").cast("double"))
    staged
      .withColumn("__anyzero",
        max((col("__factor") <= 0.0).cast("int")).over(wCur))
      .withColumn("__sumln",
        dsumOver(when(col("__factor") > 0.0, log(col("__factor")))
          .otherwise(lit(0.0)), wCur))
      .select(col("t_days"), col("n_risk"), col("n_churned"),
        col("n_censored"),
        when(col("__anyzero") === 1, lit(0.0))
          .otherwise(exp(col("__sumln"))).as("survival"))
      .orderBy("t_days")
  }

  /** Windowed dsum: exact DECIMAL(30,12) running sum cast back to
    * double — the dsum discipline for window frames. */
  private def dsumOver(c: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.expressions.WindowSpec)
      : org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(30, 12))).over(w).cast("double")

  /** Theil-Sen robust trend per event type (Theil 1950, Sen 1968):
    * slope = MEDIAN of all pairwise day-slopes over the dense daily
    * series, intercept = median of (y − slope·t) — the trend readout
    * that shrugs off the outlier days that wreck least squares (one
    * crawler-burst day tilts an OLS fit; it is one slope sample
    * here). Breakdown point ≈ 29%. The slow-drift companion to
    * [[ewmaChart]]/[[cusumShift]]: those DETECT a shift, this
    * QUANTIFIES the drift rate robustly.
    *
    * Median convention: ascending sort, average of the two middle
    * values on even counts — replayed identically by the oracle.
    *
    * Scale shape: the data-sized pass is the (type, day) count; the
    * pairwise-slope frame is |days|² per type ON THE AGGREGATE
    * SERIES (the q268 lag-join argument — bounded by the observation
    * span, never by rows), with type-partitioned windows only. */
  def theilSenTrend(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val counts = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = counts.groupBy(col(typeCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(typeCol), col("__d0"),
        explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as("day"))
    val daily = spine.join(counts, Seq(typeCol, "day"), "left")
      .na.fill(0L, Seq("n_events"))
      .select(col(typeCol),
        (datediff(col("day"), col("__d0")) + 1).cast("long").as("__t"),
        col("n_events").cast("long").as("__x"))
      .localCheckpoint(true)
    def medianOf(vals: DataFrame, vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(typeCol)).orderBy(col(vCol))
      val ranked = vals
        .withColumn("__r", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.partitionBy(col(typeCol))))
      ranked
        // Column `/` is DOUBLE division — cast back to long for the
        // floor-division rank picks ((n+1)/2, (n+2)/2)
        .filter(col("__r") === ((col("__n") + 1) / 2).cast("long") ||
          col("__r") === ((col("__n") + 2) / 2).cast("long"))
        .groupBy(col(typeCol))
        .agg((sum(col(vCol)) / count(lit(1))).as(out))
    }
    val rhs = daily.select(col(typeCol), col("__t").as("__t2"),
      col("__x").as("__x2"))
    val slopes = daily.join(rhs, Seq(typeCol))
      .filter(col("__t2") > col("__t"))
      .select(col(typeCol),
        ((col("__x2") - col("__x")).cast("double") /
          (col("__t2") - col("__t")).cast("double")).as("__slope"))
    val slope = medianOf(slopes, "__slope", "slope_per_day")
    val resid = daily.join(slope, Seq(typeCol))
      .select(col(typeCol), col("slope_per_day"),
        (col("__x").cast("double") -
          col("slope_per_day") * col("__t").cast("double")).as("__res"))
    val intercept = medianOf(resid.select(col(typeCol), col("__res")),
      "__res", "intercept")
    val nDays = daily.groupBy(col(typeCol))
      .agg(count(lit(1)).cast("long").as("n_days"))
    nDays.join(slope, Seq(typeCol)).join(intercept, Seq(typeCol))
      .orderBy(typeCol)
  }

  /** Mann-Kendall trend test per event type (Mann 1945, Kendall
    * 1975): S = Σ_{i<j} sign(x_j − x_i) over the dense daily series,
    * tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    * Σ_ties t(t−1)(2t+5)]/18, continuity-corrected
    * z = (S∓1)/√Var(S) — the SIGNIFICANCE companion to
    * [[theilSenTrend]]: Theil-Sen says how fast the drift is, this
    * says whether a monotone trend exists at all, distribution-free
    * and outlier-immune (only signs enter). Degenerate series
    * (all-tied or < 2 days) emit null z and never flag.
    *
    * Scale shape: the data-sized pass is the (type, day) count; S is
    * one fold over the |days|²-per-type AGGREGATE pair frame (the
    * theilSenTrend argument) in exact integers; tie counts come from
    * a value-cardinality group. */
  def mannKendall(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", zCrit: Double = 1.96): DataFrame = {
    require(zCrit > 0, s"zCrit must be positive, got $zCrit")
    val counts = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val spine = counts.groupBy(col(typeCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(typeCol), col("__d0"),
        explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as("day"))
    val daily = spine.join(counts, Seq(typeCol, "day"), "left")
      .na.fill(0L, Seq("n_events"))
      .select(col(typeCol),
        (datediff(col("day"), col("__d0")) + 1).cast("long").as("__t"),
        col("n_events").cast("long").as("__x"))
      .localCheckpoint(true)
    val rhs = daily.select(col(typeCol), col("__t").as("__t2"),
      col("__x").as("__x2"))
    val sFrame = daily.join(rhs, Seq(typeCol))
      .filter(col("__t2") > col("__t"))
      .groupBy(col(typeCol))
      .agg(sum(signum((col("__x2") - col("__x")).cast("double"))
        .cast("long")).cast("long").as("s_stat"))
    val ties = daily.groupBy(col(typeCol), col("__x"))
      .agg(count(lit(1)).cast("long").as("__tc"))
      .groupBy(col(typeCol))
      .agg(sum(col("__tc") * (col("__tc") - 1L) *
        (lit(2L) * col("__tc") + 5L)).cast("long").as("__tie"),
        count(lit(1)).cast("long").as("__nvals"))
    val nD = daily.groupBy(col(typeCol))
      .agg(count(lit(1)).cast("long").as("n_days"))
    val n = col("n_days").cast("double")
    val varS = (n * (n - 1.0) * (lit(2.0) * n + 5.0) -
      col("__tie").cast("double")) / 18.0
    val sD = col("s_stat").cast("double")
    val z = when(col("n_days") >= 2L && varS > 0.0,
      when(col("s_stat") > 0L, (sD - 1.0) / sqrt(varS))
        .when(col("s_stat") < 0L, (sD + 1.0) / sqrt(varS))
        .otherwise(lit(0.0)))
    nD.join(sFrame, Seq(typeCol)).join(ties, Seq(typeCol))
      .select(col(typeCol), col("n_days"), col("s_stat"),
        varS.as("var_s"), z.as("z"),
        coalesce(abs(z) > zCrit, lit(false)).as("trend"))
      .orderBy(typeCol)
  }

  /** EXACT rolling `windowDays`-day distinct active users per day —
    * the DAU/WAU/MAU readout — computed DISTRIBUTED, with no
    * count-distinct window and no day×corpus re-scan. The trick:
    * a user counts toward day d iff their LATEST activity day a ≤ d
    * satisfies d − a < windowDays; "latest ≤ d" means d precedes the
    * user's NEXT activity day. So each (user, activity-day) pair
    * contributes to exactly the days [a, min(next−1, a+w−1)] — at
    * most `windowDays` rows per pair, each attributable without
    * looking at any other user. (The approximate path for when even
    * (user, day) dedup is too hot is a mergeable [[graft.llm.HllSketch]]
    * per day; this is the exact one.)
    *
    * Output: one row per day of the observed [min, max] activity
    * spine — silent days INCLUDED at zero, the same densification
    * argument as [[burstDetect]]'s hour spine (a gap is exactly the
    * row a usage monitor must see).
    *
    * Scale shape: ONE map-side-combined (user, day) dedup aggregate,
    * a user-keyed lead window, a ≤ windowDays-row explode, a day-keyed
    * count; the spine frames are |days|- and 1-row. Every shuffle is
    * keyed; nothing is day×users. */
  /** Robust per-group outlier detection via the MAD modified z-score
    * (Iglewicz & Hoaglin 1993, "How to detect and handle outliers"):
    * per group, med = median(value), mad = median(|v − med|),
    * mz = 0.6745·(v − med)/mad, flagged at |mz| > `cut` (their 3.5
    * recommendation). The reason it exists next to the z-gates
    * ([[burstDetect]]): extreme values inflate a mean/sd gate's own
    * threshold and mask themselves; medians don't move. mad = 0
    * (at least half the group sits exactly at the median) emits null
    * mz and never flags — a degenerate group is a data-shape finding,
    * not an outlier list.
    *
    * Determinism: medians via the [[theilSenTrend]] rank discipline
    * (row_number picks (n+1)/2 and (n+2)/2, averaged — equal boundary
    * values make tie order irrelevant); mz is IEEE arithmetic on the
    * three per-group scalars, identical in the oracle replay.
    *
    * Scale shape: two group-keyed rank windows (sorted, spill-safe)
    * and two keyed joins back onto the rows — no driver state,
    * nothing corpus². */
  def madOutliers(events: DataFrame, typeCol: String = "event_type",
      valueCol: String = "value", idCol: String = "event_id",
      cut: Double = 3.5): DataFrame = {
    require(cut > 0, s"cut must be positive, got $cut")
    def medOf(vals: DataFrame, vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(typeCol)).orderBy(col(vCol))
      vals.withColumn("__r", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          Window.partitionBy(col(typeCol))))
        // Column `/` is DOUBLE division — cast back for the
        // floor-division rank picks
        .filter(col("__r") === ((col("__n") + 1) / 2).cast("long") ||
          col("__r") === ((col("__n") + 2) / 2).cast("long"))
        .groupBy(col(typeCol))
        .agg((sum(col(vCol)) / count(lit(1))).as(out))
    }
    val base = events
      .filter(col(typeCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol), col(typeCol),
        col(valueCol).cast("double").as("__v"))
    val med = medOf(base.select(col(typeCol), col("__v")), "__v", "med")
    val withMed = base.join(med, Seq(typeCol))
      .withColumn("__ad", abs(col("__v") - col("med")))
    val mad = medOf(withMed.select(col(typeCol), col("__ad")),
      "__ad", "mad")
    val mz = when(col("mad") > 0.0,
      lit(0.6745) * (col("__v") - col("med")) / col("mad"))
    withMed.join(mad, Seq(typeCol))
      .select(col(idCol), col(typeCol), col("__v").as(valueCol),
        col("med"), col("mad"), mz.as("mz"),
        coalesce(abs(mz) > cut, lit(false)).as("outlier"))
      .orderBy(idCol)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: consecutive (prev_type → next_type) pairs within each
    * user's (ts, event_id)-ordered stream, with exact counts and the
    * conditional probability P(next | prev) — the user-journey model
    * behind "what usually follows a search?" readouts, next to the
    * funnel/attribution family.
    *
    * Determinism: ordering ties break on the event id; p is ONE IEEE
    * division of exact longs.
    *
    * Scale shape: one user-keyed lag window over the event stream
    * (the sessionize shape — the only data-sized work), then a
    * (from, to)-keyed count; the matrix is ≤ \|types\|² rows. */
  def markovTransitions(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).cast("long").as("n_transitions"))
    val outTot = pairs.groupBy(col("from_type"))
      .agg(sum(col("n_transitions")).cast("long").as("__tot"))
    pairs.join(outTot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        (col("n_transitions").cast("double") / col("__tot").cast("double"))
          .as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Stationary occupancy of the [[markovTransitions]] chain by FIXED
    * power iterations: π_{t+1}(j) = Σ_i π_t(i)·P(i,j) + dang_t/N,
    * starting uniform over the observed types, with mass parked on
    * DANGLING types (types seen only as transition targets — no
    * outgoing pairs) redistributed uniformly each step (the PageRank
    * stochastic completion, so Σ π = 1 exactly at every iteration).
    * The "where do user journeys spend their time" one-number-per-type
    * readout; a fixed `iters` keeps it deterministic and
    * oracle-replayable.
    *
    * Determinism and scale shape: the [[graft.operators.GraphOps]]
    * iteration discipline — decimal-rounded float folds, one keyed
    * join + fold per step over the ≤ \|types\|²-row matrix (tiny
    * after the single data-sized lag window inside
    * [[markovTransitions]]), N as a broadcast 1-row frame. */
  def markovStationary(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", typeCol: String = "event_type",
      idCol: String = "event_id", iters: Int = 3): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    require(iters >= 1 && iters <= 50,
      s"iters must be in [1,50], got $iters")
    val p = markovTransitions(events, tsCol, userCol, typeCol, idCol)
      .select(col("from_type"), col("to_type"), col("p"))
      .localCheckpoint(true)
    val types = p.select(col("from_type").as("event_type"))
      .unionByName(p.select(col("to_type").as("event_type")))
      .distinct()
      .localCheckpoint(true)
    val nFrame = types.agg(count(lit(1)).cast("long").as("__n"))
    var pi = types.crossJoin(broadcast(nFrame))
      .select(col("event_type"),
        (lit(1.0) / col("__n").cast("double")).as("pi"))
      .localCheckpoint(true)
    val sources = p.select(col("from_type")).distinct()
    for (_ <- 1 to iters) {
      val dang = pi.join(sources,
          pi("event_type") === sources("from_type"), "left_anti")
        .agg(coalesce(dsum(col("pi"), 12), lit(0.0)).as("__dang"))
      val flow = p.join(pi, p("from_type") === pi("event_type"))
        .select(col("to_type"), (col("pi") * col("p")).as("__c"))
        .groupBy(col("to_type")).agg(dsum(col("__c"), 12).as("__sum"))
      pi = types
        .join(flow, types("event_type") === flow("to_type"), "left")
        .crossJoin(broadcast(nFrame))
        .crossJoin(broadcast(dang))
        .select(col("event_type"),
          (coalesce(col("__sum"), lit(0.0)) +
            col("__dang") / col("__n").cast("double")).as("pi"))
        .localCheckpoint(true)
    }
    pi.orderBy(col("pi").desc, col("event_type").asc)
  }

  def rollingActiveUsers(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive, got $windowDays")
    val acts = events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__day"))
      .filter(col("__u").isNotNull && col("__day").isNotNull)
      .distinct()
    val nxt = lead(col("__day"), 1).over(
      Window.partitionBy(col("__u")).orderBy(col("__day")))
    val bounds = acts.agg(min(col("__day")).as("__d0"),
      max(col("__day")).as("__d1"))
    val contrib = acts.withColumn("__nxt", nxt)
      .select(col("__day"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__i"),
        col("__nxt"))
      .select(date_add(col("__day"), col("__i")).as("day"), col("__nxt"))
      .filter(col("__nxt").isNull || col("day") < col("__nxt"))
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("__d1"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val spine = bounds.select(explode(sequence(col("__d0"), col("__d1"),
      expr("interval 1 day"))).as("day"))
    spine.join(contrib, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_active"), lit(0L)).cast("long").as("n_active"))
  }
}
