package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dsum

/** In-engine trained quality/language classifier: logistic regression
  * over the cheap text statistics (TextAnalysis — token count, mean
  * token length, punctuation count, stopword ratio), fit by
  * deterministic FULL-BATCH gradient descent inside the engine.
  *
  * Why this exists: production corpus pipelines gate quality with a
  * learned scorer (CCNet's fastText LM filter, GPT-3/LLaMA's
  * "looks-like-reference-corpus" linear classifiers). Shipping
  * pretrained weights is out of scope here, but TRAINING in the engine
  * is exactly what a Spark-native pipeline should do: distill an
  * expensive or external label (human tags, a slow rule cascade, a
  * ground-truth column) into a linear scorer cheap enough to run on
  * every document at 100 TB.
  *
  * Scale shape: each GD iteration is ONE aggregate over the cached
  * k-column feature frame producing a k-sized gradient row on the
  * driver (k = 5 here) — no per-row state, no shuffle beyond the
  * aggregate's partial/final exchange. Scoring is a zero-shuffle map
  * with the weights inlined as literals. iters × scan at train time,
  * O(1) driver memory.
  *
  * Determinism (the oracle-gate requirement): the gradient
  * Σ (σ(w·x) − y)·xⱼ is an order-dependent double sum, so it goes
  * through the exact-decimal discipline (dsum at scale 12 — the q125
  * ln/exp precedent shows libm parity holds on both engines); the
  * per-row σ(w·x) is pure IEEE double arithmetic on identical inputs.
  * Weight updates are scalar double ops on the driver, bit-identical
  * to the oracle's unrolled-CTE replica. Two runs (or two engines)
  * produce the same weights to the last bit.
  */
object QualityClassifier {

  /** Number of features including the bias term x0. */
  val K = 5

  /** Feature frame: x0 (bias) .. x4 + the 0/1 label `y`.
    * Features are fixed-constant scaled (NOT data-standardized — a
    * mean/std pass would be two more aggregates and is unnecessary for
    * GD on features this bounded); the constants keep every feature
    * O(1) so one learning rate fits all dimensions. */
  def features(docs: DataFrame, idCol: String, textCol: String,
      label: Column, stopwords: Seq[String]): DataFrame = {
    val txt = col(textCol)
    docs.select(col(idCol),
      lit(1.0).as("x0"),
      (TextAnalysis.tokenCount(txt) / 100.0).as("x1"),
      (TextAnalysis.meanTokenLen(txt) / 10.0).as("x2"),
      (TextAnalysis.punctCount(txt) / 10.0).as("x3"),
      TextAnalysis.stopwordRatio(txt, stopwords).as("x4"),
      when(label, 1.0).otherwise(0.0).as("y"))
  }

  private def margin(w: Array[Double]): Column =
    (0 until K).map(j => lit(w(j)) * col(s"x$j"))
      .reduceLeft(_ + _) // left-assoc, matching the SQL parse of a+b+c

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Full-batch GD: wⱼ ← wⱼ − lr · Σ(σ(w·x) − y)·xⱼ / n, from w = 0.
    * One aggregate job per iteration; the feature frame is cached for
    * the loop (narrow, K+2 columns). */
  def train(feat: DataFrame, iters: Int = 3, lr: Double = 1.0): Array[Double] = {
    val cached = feat.persist()
    try {
      val n = cached.count().toDouble
      var w = Array.fill(K)(0.0)
      for (_ <- 0 until iters) {
        val p = sigmoid(margin(w))
        val grads = cached.agg(
          dsum((p - col("y")) * col("x0"), 12).as("g0"),
          (1 until K).map(j =>
            dsum((p - col("y")) * col(s"x$j"), 12).as(s"g$j")): _*).head()
        w = w.zipWithIndex.map { case (wj, j) => wj - lr * grads.getDouble(j) / n }
      }
      w
    } finally { cached.unpersist(); () }
  }

  /** Score with trained weights: zero-shuffle map, weights as
    * literals — the plan Catalyst constant-folds and codegens. */
  def score(feat: DataFrame, idCol: String, w: Array[Double]): DataFrame = {
    val s = sigmoid(margin(w))
    feat.select(col(idCol),
      s.as("quality_score"),
      (s >= 0.5).as("predicted"),
      col("y").as("label"))
  }

  /** Reliability diagram over a [[score]]d frame: equal-width bins of
    * the predicted probability vs the empirical positive rate — the
    * calibration table that decides whether a scorer's 0.9 means 90%
    * (and whether its threshold can be read as a precision target)
    * before anyone trusts a probability cut at corpus scale. Per bin:
    * n, exact-decimal mean predicted probability, empirical positive
    * fraction, and the |gap| whose n-weighted sum is ECE. A score of
    * exactly 1.0 folds into the top bin (the standard closed-top
    * rule).
    *
    * Scale shape: ONE keyed aggregate on the bin id (map-side
    * combined), ≤ `bins` output rows. Determinism: mean_p is a dsum
    * (exact DECIMAL, one final IEEE division); frac_pos is a ratio of
    * exact longs; gap is one IEEE subtraction of those two doubles. */
  def calibrationBins(scored: DataFrame, probCol: String = "quality_score",
      labelCol: String = "label", bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val dec = org.apache.spark.sql.types.DecimalType(30, 12)
    scored
      .select(least(floor(col(probCol) * bins), lit(bins - 1))
          .cast("long").as("bin"),
        col(probCol).cast("double").as("__p"),
        col(labelCol).cast("double").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        (sum(col("__p").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("mean_p"),
        (sum(col("__y").cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("frac_pos"))
      .withColumn("gap", abs(col("frac_pos") - col("mean_p")))
  }

  /** Precision/recall/F1 sweep over score thresholds — the table
    * that turns a scorer into a FILTER: AUC says the ordering is
    * good, calibration says the probabilities mean something; this
    * says what a cut at 0.7 actually costs in kept-junk (precision)
    * and lost-good-docs (recall) at corpus scale. One row per
    * threshold with the full confusion counts, so downstream can
    * re-derive any metric.
    *
    * Scale shape: ONE map-side-combined aggregate computing every
    * threshold's TP/FP as conditional sums in the same pass (2·|T|
    * counters riding one fold — no per-threshold scan, no
    * threshold×rows explode); the per-threshold rows then unpack
    * from the single aggregate row. Determinism: all counts exact
    * longs; precision/recall/F1 are fixed-shape IEEE expressions of
    * them (F1 composed from the two computed doubles, the same
    * shape the oracle replays). */
  def prCurve(scored: DataFrame, probCol: String = "quality_score",
      labelCol: String = "label",
      thresholds: Seq[Double] = (1 to 9).map(_ / 10.0)): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val s = scored.select(col(probCol).cast("double").as("__p"),
      col(labelCol).cast("long").as("__y"))
    val aggs =
      Seq(count(lit(1)).as("__n"), sum(col("__y")).as("__pos")) ++
      thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("__p") >= t && col("__y") === 1L, 1L).otherwise(0L))
          .as(s"__tp$i"),
        sum(when(col("__p") >= t && col("__y") === 0L, 1L).otherwise(0L))
          .as(s"__fp$i"))
      }
    val one = s.agg(aggs.head, aggs.tail: _*)
    val packed = one.select(col("__n"), col("__pos"),
      explode(array(thresholds.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("threshold"), col(s"__tp$i").as("tp"),
          col(s"__fp$i").as("fp"))
      }: _*)).as("__x"))
    val tp = col("__x.tp").cast("long")
    val fp = col("__x.fp").cast("long")
    val fn = (col("__pos") - tp).cast("long")
    val tn = (col("__n") - col("__pos") - fp).cast("long")
    val precision = when(tp + fp > 0L,
      tp.cast("double") / (tp + fp).cast("double"))
    val recall = when(col("__pos") > 0L,
      tp.cast("double") / col("__pos").cast("double"))
    val f1 = when(precision.isNotNull && recall.isNotNull &&
        precision + recall > 0.0,
      lit(2.0) * precision * recall / (precision + recall))
    packed.select(col("__x.threshold").as("threshold"),
      tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"),
      precision.as("precision"), recall.as("recall"), f1.as("f1"))
  }

  /** Per-slice precision/recall/F1 threshold sweep: [[prCurve]]
    * computed independently for every value of `groupCol` in ONE
    * grouped pass (the [[graft.llm.Stats.aucByGroup]] slice
    * discipline) — the fairness/segment decision table that catches a
    * cut that is right globally and wrong for one source or language
    * slice, which the global q248 sweep averages away.
    *
    * Scale shape: the corpus-sized work is ONE map-side-combined
    * groupBy aggregate carrying 2·|thresholds|+2 conditional sums;
    * the explode emits |groups|·|thresholds| rows. No threshold×rows
    * blow-up, no per-group pass. */
  def prCurveByGroup(scored: DataFrame, groupCol: String,
      probCol: String = "quality_score", labelCol: String = "label",
      thresholds: Seq[Double] = (1 to 9).map(_ / 10.0)): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val s = scored.select(col(groupCol).as("__g"),
      col(probCol).cast("double").as("__p"),
      col(labelCol).cast("long").as("__y"))
    val aggs =
      Seq(count(lit(1)).as("__n"), sum(col("__y")).as("__pos")) ++
      thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(col("__p") >= t && col("__y") === 1L, 1L).otherwise(0L))
          .as(s"__tp$i"),
        sum(when(col("__p") >= t && col("__y") === 0L, 1L).otherwise(0L))
          .as(s"__fp$i"))
      }
    val one = s.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
    val packed = one.select(col("__g"), col("__n"), col("__pos"),
      explode(array(thresholds.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("threshold"), col(s"__tp$i").as("tp"),
          col(s"__fp$i").as("fp"))
      }: _*)).as("__x"))
    val tp = col("__x.tp").cast("long")
    val fp = col("__x.fp").cast("long")
    val fn = (col("__pos") - tp).cast("long")
    val tn = (col("__n") - col("__pos") - fp).cast("long")
    val precision = when(tp + fp > 0L,
      tp.cast("double") / (tp + fp).cast("double"))
    val recall = when(col("__pos") > 0L,
      tp.cast("double") / col("__pos").cast("double"))
    val f1 = when(precision.isNotNull && recall.isNotNull &&
        precision + recall > 0.0,
      lit(2.0) * precision * recall / (precision + recall))
    packed.select(col("__g").as(groupCol),
      col("__x.threshold").as("threshold"),
      tp.as("tp"), fp.as("fp"), fn.as("fn"), tn.as("tn"),
      precision.as("precision"), recall.as("recall"), f1.as("f1"))
  }

  /** Isotonic calibration map by pool-adjacent-violators (Ayer et
    * al. 1955; Zadrozny & Elkan 2002 for classifier calibration): the
    * non-parametric monotone least-squares fit of label rate to
    * score — the standard calibrator when Platt's sigmoid shape is
    * wrong, and the map a production filter applies so its cut
    * thresholds read as precision targets. Output: one row per
    * distinct score, (score, n, pos, iso_prob) with iso_prob the
    * fitted monotone probability.
    *
    * Discrete contract (the [[graft.llm.Stats.chiSquare]] rule): the
    * distinct-score frame must be value-cardinality-bounded —
    * quantize continuous scores upstream. The PAV fold itself runs on
    * the driver over that bounded frame (the BPE-vocab / PCA-grid
    * bounded-collect argument: O(distinct scores), independent of
    * corpus size); the corpus-sized work is ONE map-side-combined
    * (score) count.
    *
    * Determinism: merge decisions compare block means by exact
    * BIGINT cross-multiplication (pos_a·w_b vs pos_b·w_a — no
    * doubles in control flow), and each fitted value is ONE division
    * of exact longs, so the map is bit-stable and equals the DuckDB
    * oracle's minimax replay (iso_j = max_{i≤j} min_{k≥j}
    * avg(i..k), the textbook closed form PAV solves). */
  def isotonicCalibration(scored: DataFrame,
      probCol: String = "quality_score",
      labelCol: String = "label"): DataFrame = {
    val sp = scored.sparkSession
    val cells = scored.select(col(probCol).cast("double").as("__p"),
        col(labelCol).cast("long").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .groupBy("__p")
      .agg(count(lit(1)).as("__w"), sum(col("__y")).as("__pos"))
      .orderBy("__p")
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    // PAV: maintain a stack of blocks (span, weight, pos); merge while
    // the last two violate monotonicity (exact integer comparison)
    case class Block(upto: Int, w: Long, pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    cells.zipWithIndex.foreach { case ((_, w, pos), i) =>
      stack += Block(i, w, pos)
      while (stack.length >= 2 && {
        val a = stack(stack.length - 2); val b = stack.last
        // mean_a >= mean_b  <=>  pos_a*w_b >= pos_b*w_a — exact, in
        // BigInt: block weights are corpus-sized, so the cross
        // products pass 2^63 long before the means get close
        BigInt(a.pos) * b.w >= BigInt(b.pos) * a.w
      }) {
        val b = stack.remove(stack.length - 1)
        val a = stack.remove(stack.length - 1)
        stack += Block(b.upto, a.w + b.w, a.pos + b.pos)
      }
    }
    val iso = new Array[Double](cells.length)
    var lo = 0
    stack.foreach { blk =>
      val v = blk.pos.toDouble / blk.w.toDouble
      (lo to blk.upto).foreach(iso(_) = v)
      lo = blk.upto + 1
    }
    val out = cells.zipWithIndex.map { case ((p, w, pos), i) =>
      (p, w, pos, iso(i))
    }
    sp.createDataFrame(out.toIndexedSeq)
      .toDF(probCol, "n", "pos", "iso_prob")
  }

  /** Expected Calibration Error — the one-number summary of
    * [[calibrationBins]]: ECE = Σ_b (n_b/N)·|frac_pos_b − mean_p_b|,
    * the standard reliability headline (Guo et al., ICML'17) a
    * monitoring dashboard alerts on while the per-bin diagram is for
    * humans. One extra 1-row fold over the ≤ bins-row frame; the
    * weighted sum goes through exact decimal so bin order can't move
    * the double. */
  def ece(scored: DataFrame, probCol: String = "quality_score",
      labelCol: String = "label", bins: Int = 10): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(30, 12)
    calibrationBins(scored, probCol, labelCol, bins)
      .agg(sum(col("n")).as("n_total"),
        (sum((col("n").cast("double") * col("gap")).cast(dec))
          .cast("double") /
          sum(col("n")).cast("double")).as("ece"))
  }

  /** Cohen's kappa between two boolean verdict columns — the
    * chance-corrected agreement between two quality filters (the
    * rule cascade vs the trained scorer, two classifier versions, a
    * human sample vs either): observed agreement p_o corrected by the
    * agreement p_e two independent raters with these marginals would
    * reach by luck, κ = (p_o − p_e)/(1 − p_e). The curation question
    * it answers: does the learned filter actually add signal over the
    * rules, or does it just mimic them (κ ≈ 1)? Emits the 2×2
    * confusion counts alongside κ so the direction of disagreement is
    * read off the same row. Degenerate marginals (p_e = 1 — both
    * raters constant) emit null κ.
    *
    * Rows with a NULL verdict on either side are EXCLUDED
    * (complete-case, the chiSquare contract): a null would count in
    * n but in none of the four cells — when(a && !b) is null for
    * null b — silently deflating p_o and p_e. `n` counts only
    * complete rows.
    *
    * Scale shape: ONE conditional-sum aggregate over the joined
    * verdict frame (map-side combined, 1 output row); every rate is
    * an IEEE expression of exact longs. */
  def agreementKappa(df: DataFrame, colA: String,
      colB: String): DataFrame = {
    val a = col(colA).cast("boolean")
    val b = col(colB).cast("boolean")
    val agg = df.filter(a.isNotNull && b.isNotNull).agg(
      count(lit(1)).as("n"),
      sum(when(a && b, 1L).otherwise(0L)).as("n_tt"),
      sum(when(a && !b, 1L).otherwise(0L)).as("n_tf"),
      sum(when(!a && b, 1L).otherwise(0L)).as("n_ft"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("n_ff"))
    val n = col("n").cast("double")
    val po = (col("n_tt") + col("n_ff")).cast("double") / n
    val pe = ((col("n_tt") + col("n_tf")).cast("double") / n) *
      ((col("n_tt") + col("n_ft")).cast("double") / n) +
      ((col("n_ft") + col("n_ff")).cast("double") / n) *
      ((col("n_tf") + col("n_ff")).cast("double") / n)
    agg.select(col("n"), col("n_tt"), col("n_tf"), col("n_ft"),
      col("n_ff"), po.as("p_o"), pe.as("p_e"),
      when(lit(1.0) - pe === 0.0, lit(null).cast("double"))
        .otherwise((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }
}
