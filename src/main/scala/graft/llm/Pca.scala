package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Principal-component extraction over an embedding column — the
  * standard embedding-prep step for training-data pipelines ("remove
  * the top principal component" post-processing of Mu & Viswanath,
  * *All-but-the-Top*, and the SIF sentence-embedding recipe of Arora
  * et al.): the dominant direction of an embedding corpus is usually
  * a corpus-wide frequency artifact, and both outlier mining and
  * isotropy correction start from projecting onto it.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - [[secondMoment]] is ONE distributed pass. Each row expands to
  *    its dims² outer product with every term cast to
  *    `DECIMAL(30,12)` (Spark's own `Cast` rounding), and the
  *    per-partition hash aggregate combines map-side — the shuffle
  *    carries at most dims² rows *per partition*, never per record.
  *    The exact decimal sum makes the matrix independent of partition
  *    count and row order, so the result is bit-stable across
  *    cluster layouts (the q125/q167 `dsum` discipline).
  *  - Power iteration runs on the driver over the collected dims²
  *    grid — bounded like the BPE vocab collect, O(dims²·iters)
  *    regardless of corpus size.
  *  - [[project]] is a narrow map (native [[graft.functions.DotProduct]]
  *    codegen, broadcast-free: the component ships as a literal).
  *
  * Determinism: all driver folds run in ascending-index order, the
  * same sequence the DuckDB oracle's `list_sum(list_transform(...))`
  * evaluates, so cross-engine drift stays at the few-ulp level — far
  * inside the gate's 1e-9 rounding.
  */
object Pca {

  /** Uncentered second-moment matrix M = Σ x·xᵀ as a (i, j, m) grid,
    * 1-based dims, `m` double (exact decimal sum, then one cast). */
  def secondMoment(corpus: DataFrame, embedCol: String = "embedding",
      dims: Int = 64): DataFrame = {
    require(dims >= 1, s"dims must be positive, got $dims")
    val x = corpus.select(
      transform(col(embedCol), e => e.cast("double")).as("x"))
    val prods = flatten(transform(sequence(lit(1), lit(dims)), i =>
      transform(sequence(lit(1), lit(dims)), j =>
        (element_at(col("x"), i) * element_at(col("x"), j))
          .cast(DecimalType(30, 12)))))
    x.select(posexplode(prods).as(Seq("pos", "p")))
      .groupBy(col("pos"))
      .agg(sum(col("p")).as("msum"))
      .select(
        (floor(col("pos") / lit(dims)) + 1).cast("long").as("i"),
        (pmod(col("pos"), lit(dims)) + 1).cast("long").as("j"),
        col("msum").cast("double").as("m"))
  }

  /** Dominant eigenvector of the second-moment matrix by `iters`
    * rounds of power iteration from e₁, sign-canonicalized so the
    * largest-|loading| dimension (ties → lowest index) is positive.
    * Returns (loadings, eigenvalue); eigenvalue is the Rayleigh
    * quotient at the final iterate.
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
}
