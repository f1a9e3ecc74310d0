package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{Pca, TextAnalysis}
import graft.sources.Tables

/** PCA power iteration + the round-12b text additions (PMI
  * collocations, n-gram novelty). */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  private def emb = Tables.load(spark, dir, "embeddings")
  private def docs = Tables.load(spark, dir, "documents")

  test("secondMoment is symmetric with positive diagonal") {
    val m = Pca.secondMoment(emb).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(m.size == 64 * 64)
    for (i <- 1L to 64L) assert(m((i, i)) > 0.0, s"diag $i")
    for (i <- 1L to 64L; j <- 1L to 64L)
      assert(m((i, j)) == m((j, i)), s"asym at ($i,$j)")
  }

  test("topComponent is a unit-norm fixed point of M with dominant eigenvalue") {
    val rows = Pca.secondMoment(emb).collect()
    val m = Array.ofDim[Double](64, 64)
    rows.foreach(r => m(r.getLong(0).toInt - 1)(r.getLong(1).toInt - 1) = r.getDouble(2))
    val (v, lam) = Pca.topComponent(emb)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12, s"norm $norm")
    // residual ‖Mv − λv‖/λ shrinks with iteration count (the synthetic
    // fixture's spectrum is near-degenerate — λ₂/λ₁ ≈ 0.93 — so a
    // fixed-point check at the gate's 12 rounds would test the data,
    // not the algorithm; the gate itself replays the exact iterate)
    def relResid(vv: Array[Double], ll: Double): Double = {
      val mv = (0 until 64).map(i => (0 until 64).map(j => m(i)(j) * vv(j)).sum)
      math.sqrt((0 until 64).map(i => {
        val d = mv(i) - ll * vv(i); d * d
      }).sum) / ll
    }
    val r12 = relResid(v, lam)
    val (v60, l60) = Pca.topComponent(emb, iters = 60)
    val r60 = relResid(v60, l60)
    assert(r12 < 0.1, s"resid(12) $r12")
    assert(r60 < 0.02 && r60 < r12, s"resid(60) $r60 vs resid(12) $r12")
    // λ is the largest Rayleigh quotient among the basis directions
    for (i <- 0 until 64) assert(m(i)(i) <= lam + 1e-9, s"e$i beats eigval")
    // sign canon: largest-|loading| dim is positive
    val am = v.indices.maxBy(i => (math.abs(v(i)), -i))
    assert(v(am) > 0.0)
  }

  test("secondMoment enforces the malformed-corpus contract") {
    import spark.implicits._
    def runOn(rows: Seq[Option[Seq[java.lang.Float]]]): Unit = {
      val d = rows.toDF("embedding")
      Pca.secondMoment(d, dims = 4).collect()
      ()
    }
    val ok = Some(Seq[java.lang.Float](1f, 2f, 3f, 4f))
    // clean corpus passes; extra elements beyond dims are ignored
    runOn(Seq(ok, Some(Seq[java.lang.Float](1f, 2f, 3f, 4f, 5f))))
    val short = intercept[Exception] {
      runOn(Seq(ok, Some(Seq[java.lang.Float](1f, 2f))))
    }
    assert(short.getMessage.contains("need >= 4"), short.getMessage)
    val nul = intercept[Exception] { runOn(Seq(ok, None)) }
    assert(nul.getMessage.contains("null embedding"), nul.getMessage)
    val nulElem = intercept[Exception] {
      runOn(Seq(ok, Some(Seq[java.lang.Float](1f, null, 3f, 4f))))
    }
    assert(nulElem.getMessage.contains("null element"), nulElem.getMessage)
  }

  test("topComponent memo: repeat call returns equal, isolated result") {
    val (v1, l1) = Pca.topComponent(emb)
    v1(0) = Double.NaN // caller mutation must not poison the cache
    val (v2, l2) = Pca.topComponent(emb)
    assert(l1 == l2 && !v2(0).isNaN)
    assert(!(v2 eq v1) && v2.drop(1).sameElements(v1.drop(1)))
  }

  test("topComponent memo staleness: overwrite-in-place retrains fresh") {
    // Same contract as Similarity's training memo: the key carries
    // Lineage.inputSnapshot, so new bytes behind the same path (same
    // canonicalized plan) must retrain, not serve stale loadings.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pca-stale").toString
    def write(scale: Double): Unit =
      (0 until 24).map(i => (i.toLong,
        Seq.tabulate(4)(j => ((i % 5) * (j + 1)).toFloat * scale.toFloat)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(tmp)
    write(1.0)
    val (_, lam1) = Pca.topComponent(spark.read.parquet(tmp), dims = 4)
    write(3.0) // eigenvalue scales by 9× — unmistakably fresh data
    val (_, lam2) = Pca.topComponent(spark.read.parquet(tmp), dims = 4)
    assert(math.abs(lam2 - 9.0 * lam1) < 1e-6 * math.abs(lam2),
      s"retrain must see the new data: lam1=$lam1 lam2=$lam2")
  }

  test("topComponent is invariant to partitioning (exact decimal sums)") {
    val (v1, l1) = Pca.topComponent(emb.repartition(13))
    val (v2, l2) = Pca.topComponent(emb.coalesce(1))
    assert(l1 == l2)
    assert(v1.sameElements(v2))
  }

  test("project matches a driver-side dot with the same fold order") {
    val (v, _) = Pca.topComponent(emb)
    val out = Pca.project(emb, v).select("vec_id", "embedding", "proj")
      .collect()
    out.foreach { r =>
      val x = r.getSeq[Float](1)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += x(i).toDouble * v(i); i += 1 }
      assert(math.abs(s - r.getDouble(2)) < 1e-12, s"vec ${r.getLong(0)}")
    }
  }

  test("removeTop: residual is orthogonal to the component, Pythagoras holds") {
    val (v, _) = Pca.topComponent(emb)
    val out = Pca.removeTop(emb, v)
      .select(col("vec_id"), col("embedding"), col("proj"),
        col("residual"), col("resid_norm"))
      .collect()
    assert(out.length == emb.count())
    out.foreach { r =>
      val x = r.getSeq[Float](1)
      val proj = r.getDouble(2)
      val resid = r.getSeq[Double](3)
      // residual ⊥ component
      val rd = resid.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(rd) < 1e-9, s"vec ${r.getLong(0)}: resid·v = $rd")
      // ‖x‖² = proj² + ‖resid‖² (v is unit-norm)
      val xx = x.map(f => f.toDouble * f.toDouble).sum
      val rn = r.getDouble(4)
      assert(math.abs(xx - (proj * proj + rn * rn)) < 1e-9,
        s"vec ${r.getLong(0)}: pythagoras off")
    }
  }

  test("effectiveDim: analytic PR on a two-axis corpus, dims bound, partition-invariant") {
    import spark.implicits._
    // mean-zero corpus: ±a on axis 1, ±b on axis 2 (4 rows, dims=4)
    // covariance diag = (a²/2, b²/2, 0, 0) -> PR = (va+vb)²/(va²+vb²)
    val a = 4.0f; val b = 2.0f
    val rows = Seq(
      Seq(a, 0f, 0f, 0f), Seq(-a, 0f, 0f, 0f),
      Seq(0f, b, 0f, 0f), Seq(0f, -b, 0f, 0f))
    val d = rows.toDF("embedding")
    val got = Pca.effectiveDim(d, dims = 4).collect().head
    val va = a * a / 2.0; val vb = b * b / 2.0
    val want = (va + vb) * (va + vb) / (va * va + vb * vb)
    assert(got.getAs[Long]("n") == 4L && got.getAs[Long]("dims") == 4L)
    assert(math.abs(got.getAs[Double]("pr") - want) < 1e-6, s"pr=$got")
    assert(math.abs(got.getAs[Double]("pr_ratio") - want / 4) < 1e-7)
    // fixture embeddings: PR in (1, dims], and bit-stable under
    // repartitioning (the exact-decimal discipline)
    val e1 = Pca.effectiveDim(emb).collect().head
    assert(e1.getAs[Double]("pr") > 1.0 &&
      e1.getAs[Double]("pr") <= 64.0 + 1e-9)
    val e2 = Pca.effectiveDim(emb.repartition(13)).collect().head
    assert(e1.getAs[Double]("trace") == e2.getAs[Double]("trace"))
    assert(e1.getAs[Double]("fro2") == e2.getAs[Double]("fro2"))
  }

  test("pmiPairs ranks a planted collocation above independent pairs") {
    import spark.implicits._
    // "aa bb" always adjacent (perfect collocation); "cc"/"dd" frequent
    // but never adjacent to each other in a fixed rotation
    val d = (1 to 40).map(i => (i.toLong, "aa bb cc x dd y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(d, "text", minCount = 5)
      .orderBy(col("pmi_ratio").desc, col("a"), col("b")).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("a") == "aa" && top.getAs[String]("b") == "bb")
    val n = 40L * 6L
    // aa->bb: cab=40, ca=cb=40 → ratio = 40·N/1600 = N/40 = 6
    assert(top.getAs[Double]("pmi_ratio") == (40L * n).toDouble / (40L * 40L).toDouble)
    // every pair in a fixed phrase has cab = 40; minCount prunes nothing else
    assert(out.forall(_.getAs[Long]("cab") == 40L))
  }

  test("pmiPairs minCount prunes rare pairs before ranking") {
    import spark.implicits._
    val d = ((1 to 9).map(i => (i.toLong, "p q")) :+ (10L, "r s"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiPairs(d, "text", minCount = 5).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("p", "q")))
  }

  test("ngramNovelty: first doc fully novel, exact copy fully stale") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"), // exact copy → novelty 0
      (3L, "z y x w v u t s") // disjoint → novelty 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(d, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.0, 1.0))
    assert(out.forall(_.getLong(1) == 4L)) // 8 tokens → 4 distinct 5-grams
  }

  test("ngramNovelty counts distinct shingles once") {
    import spark.implicits._
    // "a a a a a a" has one distinct 5-gram repeated twice
    val d = Seq((1L, "a a a a a a")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(d, "doc_id", "text", n = 5).collect()
    assert(out.head.getLong(1) == 1L && out.head.getDouble(3) == 1.0)
  }
}
