package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-free corpus statistics: the evaluation/monitoring
  * readouts (AUC, independence tests, rank correlation) that sit on
  * top of the doc-stat and classifier families. Shared machinery: the
  * banded average-rank construction — ranks with ties resolved to the
  * tie group's AVERAGE rank, computed without any global-sort window
  * (the vocabCoverage two-level prefix sum on the DISTINCT-value
  * frame), carried as 2·rank in exact integers so ".5" average ranks
  * never touch a double until the final expression. */
object Stats {

  private val dec = DecimalType(38, 0)

  /** Per distinct value of `vCol`: (value, cnt, rank2) where rank2 is
    * TWICE the average ascending rank of that value's tie group —
    * 2·cum_before + cnt + 1, an exact long. `bandExpr` must be a
    * monotone band of the value (bands partition the value order);
    * windows then run per band on the distinct-value frame with the
    * |bands|-row offset table broadcast — no unpartitioned data-sized
    * sort. */
  private[llm] def avgRank2(vals: DataFrame, vCol: String,
      bandExpr: Column): DataFrame =
    avgRank2Counted(vals.groupBy(col(vCol)).agg(count(lit(1)).as("cnt")),
      vCol, bandExpr)

  /** [[avgRank2]] over an ALREADY-COUNTED (value, "cnt") frame —
    * callers that have grouped the data anyway (auc) feed their
    * distinct-value frame here instead of paying a second full scan
    * of the upstream pipeline. */
  private[llm] def avgRank2Counted(c0: DataFrame, vCol: String,
      bandExpr: Column): DataFrame = {
    val c = c0.withColumn("__bk", bandExpr)
    val wIn = Window.partitionBy(col("__bk")).orderBy(col(vCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = c.groupBy("__bk").agg(sum("cnt").as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__bk"), col("__off"))
    c.withColumn("__cumIn", coalesce(sum(col("cnt")).over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq("__bk"))
      .select(col(vCol), col("cnt"),
        (lit(2L) * (col("__off") + col("__cumIn")) + col("cnt") + 1L)
          .as("rank2"))
  }

  /** Band count for the banded-rank decomposition, derived from the
    * session's parallelism (4× oversubscribed, floored at 64) instead
    * of a constant — a fixed 64 would pin the within-band rank
    * windows' parallelism at 64 tasks regardless of cluster size,
    * leaving corpus/64 rows per task at 100 TB. Banding is a parallel
    * decomposition only: rank2 is exact for ANY band count, so the
    * derived count never changes results, just task granularity. */
  private[llm] def derivedBandCount(sp: org.apache.spark.sql.SparkSession)
      : Int = math.max(64, sp.sparkContext.defaultParallelism * 4)

  /** Band for a [0,1]-ish score: parallelism-derived equal slices,
    * clamped ([[derivedBandCount]]). Takes the INPUT FRAME's session —
    * `SparkSession.active` could belong to a different session in a
    * multi-session JVM (granularity-only, results are band-count
    * invariant, but the rest of this file threads the frame's own
    * session and this should too). */
  private def unitBand(v: Column,
      sp: org.apache.spark.sql.SparkSession): Column = {
    val n = derivedBandCount(sp)
    greatest(least(floor(v * n).cast("long"), lit(n - 1L)), lit(0L))
  }

  /** Band for a non-negative integral stat: bit length. Negative
    * values would band AFTER all positives (bin(-1) is 64 ones),
    * silently breaking the monotone-band precondition — raise instead
    * (the quantileNormalize contract; shift signed stats upstream). */
  private[llm] def bitBand(v: Column): Column =
    when(v < 0, raise_error(concat(lit("Stats: negative value "),
      v.cast("string"))).cast("long"))
      .otherwise(length(bin(v)).cast("long"))

  /** ROC-AUC of a scorer against binary labels, computed EXACTLY by
    * the Mann-Whitney rank-sum with midrank tie handling — THE
    * threshold-free classifier-quality headline beside the q197/q199
    * calibration family (calibration asks "is 0.9 really 90%?"; AUC
    * asks "does the scorer order positives above negatives at all?").
    * AUC = (Σ_pos rank2 − n_pos(n_pos+1)) / (2·n_pos·n_neg) — every
    * term an exact integer (rank2 = twice the midrank), ONE final
    * IEEE division, so the gate hashes bit-for-bit. Degenerate label
    * sets (no positives or no negatives) emit null.
    *
    * Scale shape: one score-keyed count aggregate (map-side
    * combined), the banded average-rank pass on the DISTINCT-score
    * frame, one 1-row fold. Rank-sum in DECIMAL(38,0): Σpos·rank2 is
    * bounded by 2n², past 2^63 at ~2e9 rows (the pmiPairs lesson). */
  def auc(scored: DataFrame, probCol: String = "quality_score",
      labelCol: String = "label"): DataFrame = {
    val s = scored.select(col(probCol).as("__p"),
      col(labelCol).cast("long").as("__y"))
    val byScore = s.groupBy("__p")
      .agg(count(lit(1)).as("cnt"), sum("__y").as("pos"))
    // ONE scan of the scored pipeline: the rank construction consumes
    // the same distinct-score frame the pos counts came from
    val ranked = avgRank2Counted(byScore.select(col("__p"), col("cnt")),
        "__p", unitBand(col("__p"), scored.sparkSession))
      .join(byScore.select(col("__p"), col("pos")), Seq("__p"))
    val a = ranked.agg(
      sum(col("cnt")).as("n"),
      sum(col("pos")).as("n_pos"),
      sum(col("pos").cast(dec) * col("rank2")).as("__s2"))
    val nPos = col("n_pos")
    val nNeg = col("n") - col("n_pos")
    a.select(col("n"), nPos.as("n_pos"), nNeg.as("n_neg"),
      when(nPos > 0 && nNeg > 0,
        (col("__s2") - (nPos.cast(dec) * (nPos + 1L))).cast("double") /
          (lit(2.0) * nPos.cast("double") * nNeg.cast("double")))
        .as("auc"))
  }

  /** Pearson chi-square test of independence between two categorical
    * doc features (length band × language, source × quality tier —
    * "is quality independent of source?" is the question behind every
    * per-source funnel): χ² = Σ_cells (o − e)²/e over the FULL
    * category spine (unobserved combinations contribute their
    * expected mass — dropping them understates χ²). Returns one row:
    * n, category counts, dof, chi2.
    *
    * Determinism: observed/marginal counts are exact longs; each
    * cell term is a fixed-shape IEEE expression of those, decimal-
    * rounded before the exact sum (q167 discipline).
    *
    * Scale shape: ONE (a, b)-keyed count (map-side combined); the
    * spine is the |A|·|B| marginal cross join — category-sized, tiny,
    * broadcast throughout.
    *
    * Null categories are EXCLUDED (complete-case analysis, the
    * standard χ² contract): a null-keyed cell would inflate the
    * marginals yet never match the spine's equi-join, silently
    * dropping its observed mass. `n` counts only complete rows. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d12 = DecimalType(30, 12)
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("__a").agg(sum("o").as("ra"))
    val cb = cells.groupBy("__b").agg(sum("o").as("cb"))
    val n = cells.agg(sum("o").as("n"))
    val spine = ra.crossJoin(cb)
      .join(cells, Seq("__a", "__b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(n))
    val e = (col("ra").cast("double") * col("cb").cast("double")) /
      col("n").cast("double")
    val term = ((col("o").cast("double") - e) * (col("o").cast("double") - e)
      / e).cast(d12)
    spine.agg(
      first(col("n")).as("n"),
      countDistinct(col("__a")).as("n_a"),
      countDistinct(col("__b")).as("n_b"),
      sum(term).cast("double").as("chi2"))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1L) * (col("n_b") - 1L)).as("dof"), col("chi2"))
  }

  /** Two-proportion A/B test readout — the experimentation gate a
    * metrics layer ships beside its dashboards: per variant, trials /
    * successes / rate with the Wilson 95% score interval (the CI that
    * stays inside [0,1] and behaves at small n, unlike the Wald
    * interval), plus the pooled two-proportion z statistic and the
    * |z| > zCrit significance verdict repeated on both rows. Exactly
    * two variants required; which is "first" is their sort order, and
    * z is signed first − second. Degenerate pooled rates (0 or 1)
    * emit null z and never claim significance.
    *
    * Scale shape: ONE map-side-combined 2-group count; everything
    * after is scalar expressions on 1-2-row frames (struct min/max
    * pivots the two rows without a driver collect). */
  def abTest(units: DataFrame, groupCol: String, successCol: String,
      zCrit: Double = 1.96): DataFrame = {
    require(zCrit > 0, s"zCrit must be positive, got $zCrit")
    val g = units
      .filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(successCol).cast("int").cast("long")).cast("long").as("x"))
      .localCheckpoint(true)
    require(g.count() == 2L,
      s"abTest needs exactly 2 variants in $groupCol")
    val flat = g.select(struct(col("grp"), col("n"), col("x")).as("s"))
      .agg(min(col("s")).as("s1"), max(col("s")).as("s2"))
      .select(
        col("s1.n").cast("double").as("__n1"),
        col("s1.x").cast("double").as("__x1"),
        col("s2.n").cast("double").as("__n2"),
        col("s2.x").cast("double").as("__x2"))
    val pp = (col("__x1") + col("__x2")) / (col("__n1") + col("__n2"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("__n1") + lit(1.0) / col("__n2")))
    val zStat = when(se > 0.0,
      (col("__x1") / col("__n1") - col("__x2") / col("__n2")) / se)
    val zf = flat.select(zStat.as("z"))
    val p = col("x").cast("double") / col("n").cast("double")
    val z2n = lit(zCrit * zCrit) / col("n").cast("double")
    val center = (p + z2n / 2.0) / (lit(1.0) + z2n)
    val half = (lit(zCrit) * sqrt(p * (lit(1.0) - p) / col("n").cast("double")
      + z2n / (lit(4.0) * col("n").cast("double")))) / (lit(1.0) + z2n)
    g.crossJoin(broadcast(zf))
      .select(col("grp"), col("n"), col("x").as("successes"),
        p.as("rate"),
        (center - half).as("ci_lo"), (center + half).as("ci_hi"),
        col("z"),
        coalesce(abs(col("z")) > zCrit, lit(false)).as("significant"))
      .orderBy("grp")
  }

  /** Difference-in-differences (the Card-Krueger 2×2): with units
    * observed in a pre and a post period across two groups, the
    * treatment-effect estimate is
    * DiD = (ȳ_b,post − ȳ_b,pre) − (ȳ_a,post − ȳ_a,pre) — the
    * second difference cancels both the group-level baseline gap and
    * the shared time trend, which is why it is the default causal
    * readout when randomization wasn't available (rollouts by
    * region, staggered launches). SE via the four cell variances
    * (Welch-style, independent cells); groups and periods are
    * ordered by their sort order (a = first group, pre = first
    * period). Exactly 2 groups × 2 periods required.
    *
    * Scale shape: ONE map-side-combined 4-cell moment aggregate; the
    * 4-cell pivot and all scalars run on that aggregate frame (one
    * 1-row driver fetch for the label/arity contract, the [[abTest]]
    * precedent). */
  def diffInDiff(units: DataFrame, groupCol: String, periodCol: String,
      metricCol: String, zCrit: Double = 1.96): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    require(zCrit > 0, s"zCrit must be positive, got $zCrit")
    val y = col(metricCol).cast("double")
    val cells = units
      .filter(col(groupCol).isNotNull && col(periodCol).isNotNull &&
        y.isNotNull)
      .groupBy(col(groupCol).as("__g"), col(periodCol).as("__p"))
      .agg(count(lit(1)).cast("long").as("__n"),
        dsum(y, 6).as("__s"), dsum(y * y, 6).as("__ss"))
      .localCheckpoint(true)
    val lab = cells.agg(
      countDistinct(col("__g")).as("ng"),
      countDistinct(col("__p")).as("np"),
      min(col("__g")).as("ga"), max(col("__g")).as("gb"),
      min(col("__p")).as("pa"), max(col("__p")).as("pb"),
      count(lit(1)).as("nc")).first()
    require(lab.getAs[Long]("ng") == 2L && lab.getAs[Long]("np") == 2L,
      s"diffInDiff needs exactly 2 groups x 2 periods, got " +
        s"${lab.getAs[Long]("ng")} x ${lab.getAs[Long]("np")}")
    // 2 distinct groups × 2 distinct periods can still be only 3
    // POPULATED cells (e.g. group b has no pre-period rows); the
    // missing cell's mean would flow a silent null through did/se
    // with significant=false instead of failing the 2×2 contract
    // loudly — so the cell COUNT must be 4, not just the arities.
    require(lab.getAs[Long]("nc") == 4L,
      s"diffInDiff needs all 4 group x period cells populated, got " +
        s"${lab.getAs[Long]("nc")}")
    val (ga, gb, pa, pb) = (lab.get(2), lab.get(3), lab.get(4), lab.get(5))
    val nD = col("__n").cast("double")
    val mean = col("__s") / nD
    val cvar = when(col("__n") >= 2L,
      greatest((col("__ss") - nD * mean * mean) / (nD - lit(1.0)),
        lit(0.0)))
    def cell(g: Any, p: Any, c: Column): Column =
      max(when(col("__g") === lit(g) && col("__p") === lit(p), c))
    val flat = cells
      .select(col("__g"), col("__p"), col("__n"), mean.as("__m"),
        cvar.as("__v"))
      .agg(
        cell(ga, pa, col("__m")).as("mean_a_pre"),
        cell(ga, pb, col("__m")).as("mean_a_post"),
        cell(gb, pa, col("__m")).as("mean_b_pre"),
        cell(gb, pb, col("__m")).as("mean_b_post"),
        (cell(ga, pa, col("__v") / col("__n").cast("double")) +
          cell(ga, pb, col("__v") / col("__n").cast("double")) +
          cell(gb, pa, col("__v") / col("__n").cast("double")) +
          cell(gb, pb, col("__v") / col("__n").cast("double")))
          .as("__sev"))
    flat
      .select(
        lit(ga).as("group_a"), lit(gb).as("group_b"),
        lit(pa).as("period_pre"), lit(pb).as("period_post"),
        col("mean_a_pre"), col("mean_a_post"),
        col("mean_b_pre"), col("mean_b_post"),
        ((col("mean_b_post") - col("mean_b_pre")) -
          (col("mean_a_post") - col("mean_a_pre"))).as("did"),
        sqrt(col("__sev")).as("se"))
      .withColumn("t_stat", when(col("se") > 0.0, col("did") / col("se")))
      .withColumn("significant",
        coalesce(abs(col("t_stat")) > zCrit, lit(false)))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013)
    * — the pre-experiment-data adjustment every mature A/B platform
    * applies before [[abTest]]-style readouts: with a pre-period
    * covariate x correlated with the experiment metric y, the
    * adjusted metric ŷ = y − θ·(x − x̄), θ = cov(x,y)/var(x), has the
    * same expectation per variant but variance shrunk by the squared
    * correlation — smaller CIs from the same traffic. θ and x̄ are
    * POOLED across variants (the standard choice — a per-variant θ
    * reintroduces bias). Emits per variant the raw and adjusted
    * means, plus the pooled θ and realized variance-reduction
    * fraction 1 − var(ŷ)/var(y) repeated on each row. Degenerate
    * var(x) = 0 yields θ null and the adjustment becomes identity.
    *
    * Scale shape: two map-side-combined passes over the unit frame
    * (pooled moments, then adjusted moments with the 1-row θ frame
    * broadcast) — no window, no join on units. All float folds
    * decimal-round each term (the dsum discipline). */
  def cuped(units: DataFrame, groupCol: String, preCol: String,
      metricCol: String): DataFrame = {
    import graft.functions.GraftFunctions.{dsum, davg}
    val x = col(preCol).cast("double")
    val y = col(metricCol).cast("double")
    val base = units.filter(col(groupCol).isNotNull &&
      x.isNotNull && y.isNotNull)
    val mom = base.agg(
      count(lit(1)).cast("long").as("__n"),
      dsum(x, 6).as("__sx"), dsum(y, 6).as("__sy"),
      dsum(x * y, 6).as("__sxy"), dsum(x * x, 6).as("__sxx"))
    val nD = col("__n").cast("double")
    val xbar = col("__sx") / nD
    val varX = col("__sxx") - nD * xbar * xbar
    val thetaF = mom.select(
      col("__n"), xbar.as("__xbar"),
      when(col("__n") >= 2L && varX > 0.0,
        (col("__sxy") - nD * (col("__sx") / nD) * (col("__sy") / nD))
          / varX).as("theta"))
    val withAdj = base.crossJoin(broadcast(thetaF))
      .withColumn("__adj",
        when(col("theta").isNotNull,
          y - col("theta") * (x - col("__xbar"))).otherwise(y))
    val pooledVar = withAdj.agg(
      count(lit(1)).cast("long").as("__np"),
      dsum(y, 6).as("__py"), dsum(y * y, 6).as("__pyy"),
      dsum(col("__adj"), 6).as("__pa"),
      dsum(col("__adj") * col("__adj"), 6).as("__paa"))
      .select(
        when(col("__np") >= 2L,
          (col("__pyy") - col("__np").cast("double")
            * (col("__py") / col("__np").cast("double"))
            * (col("__py") / col("__np").cast("double"))))
          .as("__vy"),
        when(col("__np") >= 2L,
          (col("__paa") - col("__np").cast("double")
            * (col("__pa") / col("__np").cast("double"))
            * (col("__pa") / col("__np").cast("double"))))
          .as("__va"))
      .select(when(col("__vy") > 0.0,
        lit(1.0) - col("__va") / col("__vy")).as("var_reduction"))
    withAdj.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        davg(y, 6).as("mean_metric"),
        davg(col("__adj"), 6).as("mean_cuped"),
        first(col("theta")).as("theta"))
      .crossJoin(broadcast(pooledVar))
      .orderBy("grp")
  }

  /** Benford's-law conformity test (Newcomb 1881, Benford 1938;
    * Nigrini's forensic-accounting screen): first-significant-digit
    * distribution of a positive numeric column vs the logarithmic
    * Benford expectation P(d) = log10(1 + 1/d), with the χ² statistic
    * (8 dof) and Nigrini's mean-absolute-deviation conformity score.
    * The standard data-quality screen for fabricated or truncated
    * numeric feeds: naturally-occurring multiplicative data conforms,
    * invented or clipped data does not.
    *
    * The digit is extracted EXACTLY: `floor(x·10^scale + 0.5)` → the
    * integer's leading decimal char — no log10-of-double boundary
    * hazard, identical across engines (pass `scale` = the column's
    * decimal places, e.g. 2 for currency). Rows with a non-positive
    * or null scaled value are excluded (Benford is defined on
    * positive magnitudes).
    *
    * Scale shape: ONE map-side-combined 9-group count; the digit
    * domain completion, total, and expected terms all live on 9-row
    * frames. χ²/MAD terms decimal-round before the exact sum. */
  def benfordTest(df: DataFrame, valueCol: String, scale: Int = 0): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9], got $scale")
    val spark = df.sparkSession
    val iv = floor(col(valueCol).cast("double")
      * lit(math.pow(10, scale)) + lit(0.5)).cast("long")
    val observed = df.select(iv.as("__v")).filter(col("__v") >= 1L)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).cast("long").as("n_obs"))
    val domain = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val full = broadcast(domain).join(observed, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    val scored = full
      .crossJoin(broadcast(full.agg(sum("n_obs").cast("long").as("__n"))))
      .withColumn("p_obs",
        col("n_obs").cast("double") / col("__n").cast("double"))
      .withColumn("p_benford",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)))
    val e = col("__n").cast("double") * col("p_benford")
    val chiTerm = (col("n_obs").cast("double") - e) *
      (col("n_obs").cast("double") - e) / e
    val summary = scored.agg(
      dsum(chiTerm, 12).as("chi2"),
      (dsum(abs(col("p_obs") - col("p_benford")), 12) / 9.0).as("mad"))
    scored.select(col("digit"), col("n_obs"), col("p_obs"), col("p_benford"))
      .crossJoin(broadcast(summary))
      .orderBy("digit")
  }

  /** Cramér's V on top of [[chiSquare]]: the [0, 1]-normalized
    * association strength V = √(χ²/(n·(min(r,c)−1))) that makes
    * category-pair associations COMPARABLE across different table
    * shapes (raw χ² grows with n and table size, so "which metadata
    * field leaks the label most" needs the normalized form).
    * Degenerate tables (a single category on either side) yield a
    * null V, matching the null-τ/null-ρ convention. Same scale shape
    * and complete-case handling as [[chiSquare]] — one extra scalar
    * expression on its one-row result. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = chiSquare(df, aCol, bCol)
    val minSide = least(col("n_a"), col("n_b")) - 1L
    base.withColumn("cramers_v",
      when(col("n") > 0 && minSide > 0,
        sqrt(col("chi2") / (col("n").cast("double")
          * minSide.cast("double")))))
  }

  /** Theil's uncertainty coefficient between two categorical columns —
    * the ASYMMETRIC companion to [[cramersV]]: U(a|b) = I(a;b)/H(a)
    * reads "knowing b removes this fraction of a's uncertainty", so
    * U(label|source) ≈ 1 with U(source|label) small means source
    * determines the label but not vice versa — direction Cramér's V
    * cannot express. Emits both directions plus the entropies and MI.
    *
    * Numerics: MI is summed DIRECTLY per cell (the q214 discipline —
    * never H(a)+H(b)−H(a,b), which cancels catastrophically near
    * independence); every p·ln term decimal-rounds before the exact
    * sum so the result is partition-invariant. Complete-case nulls,
    * value-cardinality-bounded cell frame (the [[chiSquare]]
    * contract). */
  def uncertaintyCoeff(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("__a").agg(sum("o").as("ra"))
    val cb = cells.groupBy("__b").agg(sum("o").as("cb"))
    val n = cells.agg(sum("o").as("n"))
    val nD = col("n").cast("double")
    val miTerm = (col("o").cast("double") / nD) *
      log((col("o").cast("double") * nD) /
        (col("ra").cast("double") * col("cb").cast("double")))
    val mi = cells
      .join(broadcast(ra), Seq("__a")).join(broadcast(cb), Seq("__b"))
      .crossJoin(broadcast(n))
      .agg(first(col("n")).as("n"), dsum(miTerm, 12).as("mi"))
    def entropy(marg: DataFrame, c: String, out: String) = marg
      .crossJoin(broadcast(n))
      .agg(dsum(-(col(c).cast("double") / nD)
        * log(col(c).cast("double") / nD), 12).as(out))
    mi
      .crossJoin(broadcast(entropy(ra, "ra", "h_a")))
      .crossJoin(broadcast(entropy(cb, "cb", "h_b")))
      .select(col("n").cast("long").as("n"), col("h_a"), col("h_b"),
        col("mi"),
        when(col("h_a") > 0.0, col("mi") / col("h_a")).as("u_a_given_b"),
        when(col("h_b") > 0.0, col("mi") / col("h_b")).as("u_b_given_a"))
  }

  /** Poisson(1) cumulative-distribution thresholds, capped at 7 draws
    * (P(X > 7) < 1.1e-5; a capped draw biases the CI by less than the
    * resampling noise floor). LITERAL constants, never computed via
    * exp() at runtime — the whole bootstrap stays transcendental-free
    * and bit-portable. */
  private val PoissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** Poisson bootstrap confidence interval for the mean of an
    * integral doc stat (Chamandy et al., Google 2012 — "Estimating
    * Uncertainty for Massive Data Streams"): the bootstrap that works
    * at 100 TB because it never materializes a resample. Each row
    * draws a Poisson(1) replication count PER REPLICATE from its own
    * md5 (order-free, cluster-size-free, reproducible), so one pass
    * computes all `b` replicate means; the CI is the nearest-rank
    * 2.5%/97.5% of the b-row mean frame. A classical resample-and-
    * recompute bootstrap is b full shuffles; this is ONE map with a
    * b-way explode into a map-side-combined replicate aggregate
    * (shuffle ≤ partitions·b rows).
    *
    * Determinism: draws come from literal CDF threshold compares on
    * the md5 uniform (the mixtureSample u construction); replicate
    * means are exact-long ratios; the point estimate is the exact
    * corpus mean. An all-zero replicate (probability e^(-n)) would
    * emit a null mean — negligible past n ≈ 50, documented not
    * guarded. */
  def poissonBootstrapCi(df: DataFrame, idCol: String, valCol: String,
      b: Int = 200): DataFrame = {
    require(b >= 40, s"need >= 40 replicates for a 95% nearest-rank CI, got $b")
    val reps = df.select(col(idCol).cast("string").as("__id"),
        col(valCol).cast("long").as("__x"))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
    val u = conv(substring(md5(concat(col("__id"), lit(":boot:"),
      col("__b").cast("string"))), 1, 6), 16, 10).cast("double") / (1 << 24)
    val w = PoissonCdf.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val means = reps.withColumn("__w", w)
      .groupBy("__b")
      .agg(sum(col("__w") * col("__x")).as("__swx"),
        sum(col("__w")).as("__sw"))
      .select((col("__swx").cast("double") / col("__sw").cast("double"))
        .as("__mb"))
    val ms = means.agg(array_sort(collect_list(col("__mb"))).as("__ms"))
    val loIdx = math.ceil(0.025 * b).toInt
    val hiIdx = math.ceil(0.975 * b).toInt
    val pt = df.agg(count(lit(1)).as("n"),
      sum(col(valCol).cast("long")).as("__sx"))
    pt.crossJoin(broadcast(ms))
      .select(col("n"), lit(b.toLong).as("b"),
        (col("__sx").cast("double") / col("n").cast("double")).as("mean"),
        element_at(col("__ms"), loIdx).as("lo"),
        element_at(col("__ms"), hiIdx).as("hi"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between an integral doc
    * stat's distribution in group A vs the rest: D = max_v |F_A(v) −
    * F_B(v)|, with the location of the maximum (lowest attaining
    * value) — WHERE the two distributions pull apart, not just how
    * far. The distribution-shape complement to PSI (q191, binned) and
    * TVD (q179, token-level): KS is binning-free and sensitive to the
    * single worst crossing. No p-value is emitted (the asymptotic
    * formula is transcendental; thresholds are the consumer's choice).
    *
    * Determinism: D's numerator |cum_A·n_B − cum_B·n_A| stays in
    * exact DECIMAL(38,0) (cum·n ≤ n², past 2^63 at ~3e9 rows) through
    * the max and argmin; ONE final IEEE division.
    *
    * Scale shape: one value-keyed count aggregate, banded cumulative
    * sums on the distinct-value frame (no global sort), two 1-row
    * folds. */
  def ksTest(df: DataFrame, valCol: String,
      groupACond: Column): DataFrame = {
    val s = df.select(col(valCol).cast("long").as("__v"),
      when(groupACond, 1L).otherwise(0L).as("__ga"))
    val byV = s.groupBy("__v")
      .agg(sum(col("__ga")).as("c1"),
        sum(lit(1L) - col("__ga")).as("c2"))
      .withColumn("__bk", bitBand(col("__v")))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOff = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byV.groupBy("__bk")
      .agg(sum("c1").as("__t1"), sum("c2").as("__t2"))
      .withColumn("__o1", coalesce(sum(col("__t1")).over(wOff), lit(0L)))
      .withColumn("__o2", coalesce(sum(col("__t2")).over(wOff), lit(0L)))
      .select(col("__bk"), col("__o1"), col("__o2"))
    // totals from the distinct-value frame, not a third corpus scan
    // (the byV exchange is reused by Spark when subtrees are identical)
    val tot = byV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val cums = byV
      .withColumn("__i1", sum(col("c1")).over(wIn))
      .withColumn("__i2", sum(col("c2")).over(wIn))
      .join(broadcast(offsets), Seq("__bk"))
      .crossJoin(broadcast(tot))
      .select(col("__v"), col("n1"), col("n2"),
        abs((col("__o1") + col("__i1")).cast(dec) * col("n2") -
          (col("__o2") + col("__i2")).cast(dec) * col("n1")).as("num"))
    val top = cums.agg(max(col("num")).as("__dm"))
    cums.crossJoin(broadcast(top))
      .filter(col("num") === col("__dm"))
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        min(col("__v")).as("at_value"), first(col("__dm")).as("__dm"))
      .select(col("n1"), col("n2"),
        when(col("n1") > 0 && col("n2") > 0,
          col("__dm").cast("double") /
            (col("n1").cast(dec) * col("n2")).cast("double")).as("d_stat"),
        col("at_value"))
  }

  /** Spearman rank correlation between two non-negative integral doc
    * stats — the monotone-association readout that survives the
    * heavy-tailed, outlier-ridden distributions where Pearson on raw
    * values is meaningless (one giant page dominates the covariance).
    * Midrank ties via the shared rank2 construction; ρ is Pearson on
    * the rank2 values (Pearson is affine-invariant, so the factor of
    * 2 cancels) with every moment an exact DECIMAL(38,0) sum and ONE
    * final IEEE expression. Constant columns (zero rank variance)
    * emit null; negative values raise (the [[bitBand]] contract —
    * shift signed stats upstream). Moment bound: Σrank2·rank2' ≤ 4n³
    * — inside DECIMAL(38,0) to ~6e12 rows; shard beyond that. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val s = df.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("long").as("__y"))
    val rx = avgRank2(s.select(col("__x")), "__x", bitBand(col("__x")))
      .select(col("__x"), col("rank2").as("__rx"))
    val ry = avgRank2(s.select(col("__y")), "__y", bitBand(col("__y")))
      .select(col("__y"), col("rank2").as("__ry"))
    val j = s.join(rx, Seq("__x")).join(ry, Seq("__y"))
    val m = j.agg(
      count(lit(1)).as("n"),
      sum(col("__rx").cast(dec)).as("sx"),
      sum(col("__ry").cast(dec)).as("sy"),
      sum(col("__rx").cast(dec) * col("__rx")).as("sxx"),
      sum(col("__ry").cast(dec) * col("__ry")).as("syy"),
      sum(col("__rx").cast(dec) * col("__ry")).as("sxy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("n"),
      when(vx > 0.0 && vy > 0.0, cov / (sqrt(vx) * sqrt(vy))).as("rho"))
  }

  /** Exact Kendall tau-b between two DISCRETE stats, computed on the
    * value-pair contingency grid instead of the O(n²) pair space: a
    * pair of rows is concordant iff its two cells dominate each other
    * in both coordinates, so C = Σ_cells c(x,y)·S(x,y) with S the
    * strict 2-D dominance sum Σ_{x'>x, y'>y} c — two chained window
    * suffix sums over the DENSE |X|×|Y| grid (partition by x for the
    * y-suffix, then by y for the x-suffix), never a row-pair join.
    * Discordant mirrors with the y-prefix. Tie terms come off the
    * marginals; tau_b = (C−D)/√((n0−n1)(n0−n2)).
    *
    * Contract: both stats must be discrete (int-castable) — the grid
    * is |X|·|Y| cells, bounded by value cardinalities, not rows (the
    * [[chiSquare]] contract). Pair counts C, D, n0 are exact
    * DECIMAL(38,0) internally (they grow as n², past BIGINT at corpus
    * scale) and surface as the double tau plus BIGINT cell/marginal
    * diagnostics. Diagnostic range: `concordant`/`discordant` are
    * BIGINT output columns, so past n ≈ 4.3e9 rows (n² > 2^63) the
    * long cast overflows them to NULL — tau_b itself stays correct at
    * any n because it is computed from the decimal sums BEFORE the
    * cast. Callers needing exact pair counts past that range should
    * read the decimal internals, not the diagnostic columns. Nulls
    * are complete-case dropped, matching [[chiSquare]]. */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val s = df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val cells = s.groupBy("__x", "__y").agg(count(lit(1)).as("c"))
    // dense grid: dominance windows need a row at EVERY (x, y) lattice
    // point — |X|·|Y| rows, the documented discrete-stat bound; the
    // distinct-y frame broadcasts
    val xs = cells.select(col("__x")).distinct()
    val ys = cells.select(col("__y")).distinct()
    val grid = xs.crossJoin(broadcast(ys))
      .join(cells, Seq("__x", "__y"), "left")
      .select(col("__x"), col("__y"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wYsuf = Window.partitionBy("__x").orderBy("__y")
      .rowsBetween(1, Window.unboundedFollowing)
    val wYpre = Window.partitionBy("__x").orderBy("__y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val staged = grid
      .withColumn("bs", coalesce(sum(col("c")).over(wYsuf), lit(0L)))
      .withColumn("bp", coalesce(sum(col("c")).over(wYpre), lit(0L)))
    val wXsuf = Window.partitionBy("__y").orderBy("__x")
      .rowsBetween(1, Window.unboundedFollowing)
    val dom = staged
      .withColumn("sdom", coalesce(sum(col("bs")).over(wXsuf), lit(0L)))
      .withColumn("ddom", coalesce(sum(col("bp")).over(wXsuf), lit(0L)))
    val cd = dom.agg(
      sum(col("c")).cast("long").as("n"),
      sum(col("c").cast(dec) * col("sdom")).as("conc"),
      sum(col("c").cast(dec) * col("ddom")).as("disc"))
    // tie terms off the marginals: n1 = Σ_x t(t-1)/2, n2 likewise
    def tieHalfPairs(keyCol: String) = cells.groupBy(keyCol)
      .agg(sum(col("c")).as("t"))
      .agg(coalesce(sum(col("t").cast(dec) * (col("t") - 1)), lit(0).cast(dec))
        .as("tp")) // 2× the tie pairs; halved in the final expression
    val tx = tieHalfPairs("__x").select(col("tp").as("tpx"))
    val ty = tieHalfPairs("__y").select(col("tp").as("tpy"))
    val nD = col("n").cast(dec)
    val n0x2 = nD * (col("n") - 1) // 2·n0
    val denomL = (n0x2 - col("tpx")).cast("double") / 2.0
    val denomR = (n0x2 - col("tpy")).cast("double") / 2.0
    cd.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("n"),
        // try_cast: past n ≈ 4.3e9 the exact decimal pair counts no
        // longer fit BIGINT — degrade the diagnostics to NULL (under
        // default ANSI a plain cast would abort the job) while tau_b
        // below stays exact off the decimals
        expr("try_cast(conc AS BIGINT)").as("concordant"),
        expr("try_cast(disc AS BIGINT)").as("discordant"),
        expr("try_cast(tpx / 2 AS BIGINT)").as("ties_x"),
        expr("try_cast(tpy / 2 AS BIGINT)").as("ties_y"),
        when(denomL > 0.0 && denomR > 0.0,
          (col("conc") - col("disc")).cast("double")
            / (sqrt(denomL) * sqrt(denomR))).as("tau_b"))
  }

  /** Per-group split-conformal threshold (Vovk; Lei et al.): the
    * k-th smallest score with k = ⌈(n+1)(1−α)⌉ — the
    * FINITE-SAMPLE-valid cut: any exchangeable future score lands at
    * or below it with probability ≥ 1−α, no distributional
    * assumption. This is how a quality/perplexity filter threshold
    * gets a guarantee instead of a vibe: calibrate on a held-out
    * group, read the threshold, filter at it. Groups too small to
    * certify (k > n, i.e. n < ⌈(1−α)/α⌉-ish) emit a NULL threshold —
    * the honest answer, not max().
    *
    * Output: (group, n, k, threshold, coverage) with coverage the
    * REALIZED fraction ≤ threshold (≥ (1−α) by construction; the gap
    * above it is the tie/discreteness slack).
    *
    * Scale shape: one (group, score)-keyed count (map-side combined),
    * a group-partitioned cumulative window on the DISTINCT-score
    * frame (value-cardinality-sized — the [[chiSquare]] discrete
    * contract), |groups|-row joins broadcast. */
  def conformalThreshold(df: DataFrame, groupCol: String, scoreCol: String,
      alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val s = df.select(col(groupCol).as("__g"),
        col(scoreCol).cast("double").as("__s"))
      .filter(col("__g").isNotNull && col("__s").isNotNull)
    val cells = s.groupBy("__g", "__s").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("__g").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells.withColumn("cum", sum(col("c")).over(wCum))
    val tot = cum.groupBy("__g").agg(max(col("cum")).cast("long").as("n"))
      .withColumn("k",
        ceil((col("n") + 1L).cast("double") * (1.0 - alpha)).cast("long"))
    val hit = cum.join(broadcast(tot), Seq("__g"))
      .filter(col("cum") >= col("k"))
      .groupBy("__g")
      .agg(min(struct(col("__s"), col("cum"))).as("__t"))
      .select(col("__g"), col("__t.__s").as("threshold"),
        col("__t.cum").cast("long").as("__chit"))
    tot.join(hit, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n"), col("k"),
        when(col("k") <= col("n"), col("threshold")).as("threshold"),
        when(col("k") <= col("n"),
          col("__chit").cast("double") / col("n").cast("double"))
          .as("coverage"))
  }

  /** Per-slice exact ROC-AUC — [[auc]] stratified by a group column,
    * the fairness/monitoring readout ("the scorer is fine overall and
    * broken on src7" is invisible to the global number). Same
    * Mann-Whitney midrank construction; the rank window partitions by
    * GROUP over each group's distinct-score frame, so every rank2 is
    * the within-group exact integer. Degenerate slices (one class)
    * emit null auc, matching [[auc]].
    *
    * Scale shape: one (group, score)-keyed count aggregate, a
    * group-partitioned window on the distinct-score frame
    * (value-cardinality per group, never row-sized), one group-keyed
    * fold. Rank sums in DECIMAL(38,0) (the pmiPairs lesson). */
  def aucByGroup(scored: DataFrame, groupCol: String,
      probCol: String = "quality_score",
      labelCol: String = "label"): DataFrame = {
    val s = scored.select(col(groupCol).as("__g"), col(probCol).as("__p"),
        col(labelCol).cast("long").as("__y"))
      .filter(col("__g").isNotNull)
    val byScore = s.groupBy("__g", "__p")
      .agg(count(lit(1)).as("cnt"), sum("__y").as("pos"))
    val wBefore = Window.partitionBy("__g").orderBy("__p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore.withColumn("rank2",
      lit(2L) * coalesce(sum(col("cnt")).over(wBefore), lit(0L)) +
        col("cnt") + 1L)
    val a = ranked.groupBy("__g").agg(
      sum(col("cnt")).as("n"),
      sum(col("pos")).as("n_pos"),
      sum(col("pos").cast(dec) * col("rank2")).as("__s2"))
    val nPos = col("n_pos")
    val nNeg = col("n") - col("n_pos")
    a.select(col("__g").as(groupCol),
      col("n").cast("long").as("n"),
      nPos.cast("long").as("n_pos"), nNeg.cast("long").as("n_neg"),
      when(nPos > 0 && nNeg > 0,
        (col("__s2") - (nPos.cast(dec) * (nPos + 1L))).cast("double") /
          (lit(2.0) * nPos.cast("double") * nNeg.cast("double")))
        .as("auc"))
  }
}
