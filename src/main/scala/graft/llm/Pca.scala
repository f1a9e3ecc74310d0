package graft.llm

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Principal-component extraction over an embedding column — the
  * standard embedding-prep step for training-data pipelines ("remove
  * the top principal component" post-processing of Mu & Viswanath,
  * *All-but-the-Top*, and the SIF sentence-embedding recipe of Arora
  * et al.): the dominant direction of an embedding corpus is usually
  * a corpus-wide frequency artifact, and both outlier mining and
  * isotropy correction start from projecting onto it.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - [[secondMoment]] is ONE distributed pass through a typed
  *    [[SecondMomentAggregator]] whose buffer is the dims·(dims+1)/2
  *    upper triangle of exact decimals — O(dims²) per PARTITION, not
  *    per record. Nothing is exploded: the r12 implementation
  *    expanded every row to its dims² outer-product cells
  *    (4096 rows/record pre-aggregation); this one folds each record
  *    into the partition-local buffer in place, and the shuffle
  *    carries one ~2k-entry buffer per map task.
  *  - Each outer-product term is rounded to `DECIMAL`-scale 12 the
  *    exact way Spark's double→decimal `Cast` does
  *    (`BigDecimal.valueOf`, i.e. shortest-repr, HALF_UP) and summed
  *    EXACTLY, so the matrix is independent of partition count and
  *    row order — bit-stable across cluster layouts (the q125/q167
  *    `dsum` discipline), and identical to the DuckDB oracle's
  *    `SUM(CAST(x[i]*x[j] AS DECIMAL(30,12)))`. (One delta vs the
  *    old decimal-typed `sum`: the exact BigDecimal accumulator
  *    cannot overflow at 38 digits, so corpora whose cell sums exceed
  *    1e26 now produce the true value instead of null.)
  *  - Power iteration runs on the driver over the collected dims²
  *    grid — bounded like the BPE vocab collect, O(dims²·iters)
  *    regardless of corpus size.
  *  - [[topComponent]] results are memoized per (session, canonical
  *    plan, input-file snapshot, params): the q172/q173/q177 family
  *    shares ONE training pass instead of re-running it per consumer,
  *    and an in-place file overwrite keys a fresh retrain.
  *  - [[project]] is a narrow map (native [[graft.functions.DotProduct]]
  *    codegen, broadcast-free: the component ships as a literal).
  *
  * Malformed-corpus contract: a null embedding, an embedding with
  * fewer than `dims` elements, or a null element inside the first
  * `dims` positions raises a clear error instead of silently dropping
  * cells from the moment matrix (the r12 behavior let ragged rows
  * vanish per-cell, yielding a quietly wrong matrix the oracle could
  * not catch). Elements beyond `dims` are ignored, as before.
  *
  * Determinism: all driver folds run in ascending-index order, the
  * same sequence the DuckDB oracle's `list_sum(list_transform(...))`
  * evaluates, so cross-engine drift stays at the few-ulp level — far
  * inside the gate's 1e-9 rounding.
  */
object Pca {

  /** One-pass typed aggregate for Σ x·xᵀ. Buffer = upper triangle
    * (i ≤ j; the outer product is symmetric and double multiply is
    * commutative, so mirroring at [[finish]] is exact) of exact
    * decimal sums; output = the full dims² matrix row-major as
    * doubles (each cell one final `doubleValue`, the same last-step
    * cast the old decimal pipeline applied). */
  private final class SecondMomentAggregator(dims: Int)
      extends Aggregator[Array[Double], Array[JBigDecimal], Array[Double]] {
    private val triSize = dims * (dims + 1) / 2

    override def zero: Array[JBigDecimal] =
      Array.fill(triSize)(JBigDecimal.ZERO)

    override def reduce(b: Array[JBigDecimal], x: Array[Double]): Array[JBigDecimal] = {
      if (x == null)
        throw new IllegalArgumentException(
          "Pca.secondMoment: null embedding (malformed-corpus contract)")
      if (x.length < dims)
        throw new IllegalArgumentException(
          s"Pca.secondMoment: embedding has ${x.length} elements, need >= $dims")
      var i = 0
      var idx = 0
      while (i < dims) {
        val xi = x(i)
        var j = i
        while (j < dims) {
          b(idx) = b(idx).add(
            JBigDecimal.valueOf(xi * x(j)).setScale(12, RoundingMode.HALF_UP))
          j += 1
          idx += 1
        }
        i += 1
      }
      b
    }

    override def merge(a: Array[JBigDecimal], b: Array[JBigDecimal]): Array[JBigDecimal] = {
      var k = 0
      while (k < triSize) { a(k) = a(k).add(b(k)); k += 1 }
      a
    }

    override def finish(b: Array[JBigDecimal]): Array[Double] = {
      val out = new Array[Double](dims * dims)
      var i = 0
      var idx = 0
      while (i < dims) {
        var j = i
        while (j < dims) {
          val v = b(idx).doubleValue()
          out(i * dims + j) = v
          out(j * dims + i) = v
          j += 1
          idx += 1
        }
        i += 1
      }
      out
    }

    override def bufferEncoder: Encoder[Array[JBigDecimal]] =
      Encoders.javaSerialization[Array[JBigDecimal]]
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** Uncentered second-moment matrix M = Σ x·xᵀ as a (i, j, m) grid,
    * 1-based dims, `m` double (exact decimal sum, then one cast). */
  def secondMoment(corpus: DataFrame, embedCol: String = "embedding",
      dims: Int = 64): DataFrame = {
    require(dims >= 1, s"dims must be positive, got $dims")
    val xd = transform(col(embedCol), e => e.cast("double"))
    // Enforce the malformed-corpus contract in the plan, so the error
    // carries the row's shape (not a deserializer stack trace) and the
    // kernel below can assume dims clean doubles.
    val checked = when(col(embedCol).isNull, raise_error(
        lit("Pca.secondMoment: null embedding (malformed-corpus contract)")))
      .when(size(col(embedCol)) < dims, raise_error(concat(
        lit("Pca.secondMoment: embedding has "),
        size(col(embedCol)).cast("string"), lit(s" elements, need >= $dims"))))
      .when(exists(slice(xd, 1, dims), e => e.isNull), raise_error(
        lit("Pca.secondMoment: null element inside embedding")))
      .otherwise(slice(xd, 1, dims))
    val mom = udaf(new SecondMomentAggregator(dims),
      ExpressionEncoder[Array[Double]]())
    corpus.select(checked.as("x"))
      .agg(mom(col("x")).as("grid"))
      .select(posexplode(col("grid")).as(Seq("pos", "mval")))
      .select(
        (floor(col("pos") / lit(dims)) + 1).cast("long").as("i"),
        (pmod(col("pos"), lit(dims)) + 1).cast("long").as("j"),
        col("mval").as("m"))
  }

  /** Memo for [[topComponent]]: the projection/removal gates re-train
    * on the same corpus, and the training pass is the expensive part.
    * Keyed on (session, canonicalized logical plan, input-file
    * snapshot, column, dims, iters) — `sameResult` semantics, so
    * `.repartition(n)` variants key separately (they ARE different
    * plans) while repeated reads of the same table share. The
    * [[Lineage.inputSnapshot]] component makes overwrite-in-place key
    * a MISS (fresh retrain) for file-backed corpora; non-file inputs
    * fall back to plan-only keying — the relation-cache caveat,
    * scoped to sources with no file identity.
    * Small LRU (the key pins the analyzed plan);
    * [[clearTopComponentCache]] resets unconditionally. */
  private val MemoCap = 32
  private val memo = new java.util.LinkedHashMap[
      (SparkSession, LogicalPlan, Long, String, Int, Int),
      (Array[Double], Double)](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(SparkSession, LogicalPlan, Long, String, Int, Int),
          (Array[Double], Double)]): Boolean = size > MemoCap
  }

  def clearTopComponentCache(): Unit = memo.synchronized(memo.clear())

  /** Dominant eigenvector of the second-moment matrix by `iters`
    * rounds of power iteration from e₁, sign-canonicalized so the
    * largest-|loading| dimension (ties → lowest index) is positive.
    * Returns (loadings, eigenvalue); eigenvalue is the Rayleigh
    * quotient at the final iterate. Memoized — see [[memo]].
    *
    * `iters` trades convergence against oracle-replay depth: the
    * result is the EXACT `iters`-round iterate (what the gate
    * hash-checks), so on a near-degenerate spectrum — like the
    * isotropic synthetic fixture, λ₂/λ₁ ≈ 0.93 — the default 12
    * rounds is a dominant-direction *estimate*; raise `iters` when
    * the application needs a converged eigenvector (PcaSpec pins the
    * residual shrinking with iteration count). */
  def topComponent(corpus: DataFrame, embedCol: String = "embedding",
      dims: Int = 64, iters: Int = 12): (Array[Double], Double) = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val key = (corpus.sparkSession, corpus.queryExecution.analyzed.canonicalized,
      Lineage.inputSnapshot(corpus), embedCol, dims, iters)
    memo.synchronized(Option(memo.get(key))) match {
      case Some((v, lam)) => (v.clone(), lam)
      case None =>
        val res = computeTopComponent(corpus, embedCol, dims, iters)
        memo.synchronized(memo.put(key, res))
        (res._1.clone(), res._2)
    }
  }

  private def computeTopComponent(corpus: DataFrame, embedCol: String,
      dims: Int, iters: Int): (Array[Double], Double) = {
    val m = Array.ofDim[Double](dims, dims)
    secondMoment(corpus, embedCol, dims).collect().foreach { r: Row =>
      m(r.getLong(0).toInt - 1)(r.getLong(1).toInt - 1) = r.getDouble(2)
    }
    def matVec(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        var s = 0.0
        var j = 0
        while (j < dims) { s += m(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      w
    }
    var v = new Array[Double](dims)
    v(0) = 1.0
    for (_ <- 1 to iters) {
      val w = matVec(v)
      var n2 = 0.0
      var i = 0
      while (i < dims) { n2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(n2)
      v = w.map(_ / nrm)
    }
    val w = matVec(v)
    var lam = 0.0
    var i = 0
    while (i < dims) { lam += v(i) * w(i); i += 1 }
    var am = 0
    i = 1
    while (i < dims) { if (math.abs(v(i)) > math.abs(v(am))) am = i; i += 1 }
    if (v(am) < 0) v = v.map(-_)
    (v, lam)
  }

  /** [[topComponent]] as a frame: (dim 1-based, loading, eigval). */
  def topComponentDf(corpus: DataFrame, embedCol: String = "embedding",
      dims: Int = 64, iters: Int = 12): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (v, lam) = topComponent(corpus, embedCol, dims, iters)
    v.toSeq.zipWithIndex
      .map { case (l, i) => ((i + 1).toLong, l, lam) }
      .toDF("dim", "loading", "eigval")
  }

  /** Scalar projection of every row onto a component — a narrow map;
    * the loadings ship as a literal array, no join, no shuffle. */
  def project(corpus: DataFrame, loadings: Array[Double],
      embedCol: String = "embedding", outCol: String = "proj"): DataFrame =
    corpus.withColumn(outCol,
      Similarity.dot(col(embedCol), array(loadings.map(lit(_)): _*)))

  /** All-but-the-top completion: x′ = x − (x·v)v per row, with the
    * projection and the residual norm riding along. Like [[project]]
    * a narrow map — the component is a literal, every fold is the
    * deterministic ascending-index order, zero shuffle; at 100 TB
    * this fuses into the scan stage. */
  def removeTop(corpus: DataFrame, loadings: Array[Double],
      embedCol: String = "embedding"): DataFrame = {
    val vLit = array(loadings.map(lit(_)): _*)
    corpus
      .withColumn("proj", Similarity.dot(col(embedCol), vLit))
      .withColumn("residual", zip_with(col(embedCol), vLit,
        (x, v) => x.cast("double") - col("proj") * v))
      .withColumn("resid_norm", Similarity.norm(col("residual")))
  }

  /** Effective dimensionality of the embedding corpus — the
    * participation ratio PR = tr(C)² / ‖C‖²_F of the CENTERED
    * covariance, equal to (Σλ)²/Σλ² over the eigen-spectrum but
    * computed WITHOUT an eigendecomposition (trace and Frobenius norm
    * are basis-free). PR ranges from 1 (all variance on one axis —
    * embedding collapse, the failure mode contrastive pipelines watch
    * for) to `dims` (perfectly isotropic); `pr_ratio` normalizes to
    * (0, 1]. The anisotropy readout that motivates the
    * all-but-the-top step lives in one scalar.
    *
    * Scale shape: the same ONE [[secondMoment]] pass (dims²-bounded
    * buffers) plus a dims-row mean aggregate; covariance cells are
    * formed on the dims² grid and folded through exact-decimal sums
    * (order-independent, oracle-replayable). Nothing here scales with
    * corpus size except the two aggregates' single passes. */
  def effectiveDim(corpus: DataFrame, embedCol: String = "embedding",
      dims: Int = 64): DataFrame = {
    import graft.functions.GraftFunctions.dsum
    val mom = secondMoment(corpus, embedCol, dims)
    val xd = transform(col(embedCol), e => e.cast("double"))
    // dims-row mean frame; n rides along (identical on every row)
    val means = corpus
      .select(posexplode(slice(xd, 1, dims)).as(Seq("p", "xv")))
      .groupBy("p")
      .agg(dsum(col("xv"), 12).as("sx"), count(lit(1)).as("n"))
      .select((col("p") + 1).cast("long").as("dim"),
        (col("sx") / col("n").cast("double")).as("mu"), col("n"))
    val cov = mom
      .join(broadcast(means.select(col("dim").as("i"), col("mu").as("mu_i"),
        col("n"))), Seq("i"))
      .join(broadcast(means.select(col("dim").as("j"),
        col("mu").as("mu_j"))), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        (col("m") / col("n").cast("double")
          - col("mu_i") * col("mu_j")).as("cv"))
    cov.agg(
        first(col("n")).as("n"),
        dsum(when(col("i") === col("j"), col("cv")), 12).as("trace"),
        dsum(col("cv") * col("cv"), 18).as("fro2"))
      .select(lit(dims.toLong).as("dims"), col("n"), col("trace"),
        col("fro2"),
        when(col("fro2") > 0.0, col("trace") * col("trace") / col("fro2"))
          .as("pr"),
        when(col("fro2") > 0.0,
          col("trace") * col("trace") / col("fro2") / dims).as("pr_ratio"))
  }
}
