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
  private def avgRank2(vals: DataFrame, vCol: String,
      bandExpr: Column): DataFrame = {
    val c = vals.groupBy(col(vCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__bk", bandExpr)
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

  /** Band for a [0,1]-ish score: 64 equal slices, clamped. */
  private def unitBand(v: Column): Column =
    greatest(least(floor(v * 64).cast("long"), lit(63L)), lit(0L))

  /** Band for a non-negative integral stat: bit length. */
  private def bitBand(v: Column): Column = length(bin(v)).cast("long")

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
    val ranked = avgRank2(s.select(col("__p")), "__p", unitBand(col("__p")))
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
    * broadcast throughout. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d12 = DecimalType(30, 12)
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
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

  /** Spearman rank correlation between two non-negative integral doc
    * stats — the monotone-association readout that survives the
    * heavy-tailed, outlier-ridden distributions where Pearson on raw
    * values is meaningless (one giant page dominates the covariance).
    * Midrank ties via the shared rank2 construction; ρ is Pearson on
    * the rank2 values (Pearson is affine-invariant, so the factor of
    * 2 cancels) with every moment an exact DECIMAL(38,0) sum and ONE
    * final IEEE expression. Constant columns (zero rank variance)
    * emit null. Moment bound: Σrank2·rank2' ≤ 4n³ — inside
    * DECIMAL(38,0) to ~6e12 rows; shard beyond that. */
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
}
