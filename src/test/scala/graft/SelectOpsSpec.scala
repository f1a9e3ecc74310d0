package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{Similarity, TextAnalysis}
import graft.functions.GraftFunctions.dsum
import graft.sources.Tables

/** Round-12 selection/quality ops: unigram entropy (native kernel),
  * consecutive-token-run collapse, k-center coreset selection. */
class SelectOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  // ------------------------------------------------- unigram entropy
  test("unigramEntropy: hand-computed counts and entropy") {
    val df = Seq((1L, "a a b"), (2L, "x x x"), (3L, ""), (4L, "  A a\tB "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: p = (2/3, 1/3)
    val e1 = -(2.0 / 3 * math.log(2.0 / 3)) - (1.0 / 3 * math.log(1.0 / 3))
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 2)
    assert(math.abs(out(0).getDouble(3) - e1) < 1e-11)
    assert(math.abs(out(0).getDouble(4) - 2.0 / 3) < 1e-15)
    // uniform doc: entropy exactly 0
    assert(out(1).getLong(1) == 3 && out(1).getLong(2) == 1)
    assert(out(1).getDouble(3) == 0.0)
    // empty text = the single empty token (split semantics, both engines)
    assert(out(2).getLong(1) == 1 && out(2).getLong(2) == 1)
    assert(out(2).getDouble(3) == 0.0 && out(2).getDouble(4) == 1.0)
    // trim+lower tokenization: " A a\tB " -> (a a b)
    assert(out(3).getLong(1) == 3 && out(3).getLong(2) == 2)
    assert(out(3).getDouble(3) == out(0).getDouble(3))
  }

  test("unigramEntropy: native kernel equals the explode/dsum formulation bit-for-bit") {
    // The kernel sums per-word decimal-rounded terms inside one row;
    // the reference routes the SAME terms through explode -> groupBy ->
    // dsum(12) (Spark's own double->decimal Cast). Exact equality here
    // proves the kernel's BigDecimal discipline IS the engine's —
    // which is what makes the q167 oracle hashable.
    val docs = Tables.load(spark, dir, "documents")
    val native = TextAnalysis.unigramEntropy(docs, "doc_id", "text")
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
    val p = col("c").cast("double") / col("n")
    val ref = toks
      .select(col("doc_id"), size(col("t")).as("n"), explode(col("t")).as("w"))
      .groupBy("doc_id", "n", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n").agg(
        count(lit(1)).cast("long").as("r_types"),
        dsum(-(p * log(p)), 12).as("r_entropy"))
    val joined = native.join(ref, "doc_id").collect()
    assert(joined.length == docs.count())
    joined.foreach { r =>
      assert(r.getAs[Long]("n_tokens") == r.getAs[Int]("n").toLong)
      assert(r.getAs[Long]("n_types") == r.getAs[Long]("r_types"))
      assert(r.getAs[Double]("entropy") == r.getAs[Double]("r_entropy"),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  // --------------------------------------------- token-run collapse
  test("collapseTokenRuns: runs collapse, non-adjacent dups survive") {
    val df = Seq(
      (1L, "the the cat cat cat sat"),
      (2L, "a b a"), // non-adjacent: untouched
      (3L, ""),
      (4L, " X  x\ty ")) // trim+lower first: (x x y) -> (x y)
      .toDF("doc_id", "text")
    val out = TextAnalysis.collapseTokenRuns(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((6L, 3L, 3L, "the cat sat")))
    assert(out(1) == ((3L, 3L, 0L, "a b a")))
    assert(out(2) == ((1L, 1L, 0L, "")))
    assert(out(3) == ((3L, 2L, 1L, "x y")))
  }

  test("collapseTokenRuns: fixture corpus equals a single-threaded reference") {
    val docs = Tables.load(spark, dir, "documents")
    val out = TextAnalysis.collapseTokenRuns(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val texts = docs.select("doc_id", "text").collect()
    assert(texts.nonEmpty)
    texts.foreach { r =>
      val toks = r.getString(1).trim.toLowerCase.split("\\s+", -1)
      val kept = toks.zipWithIndex
        .filter { case (t, i) => i == 0 || t != toks(i - 1) }.map(_._1)
      assert(out(r.getLong(0)) == kept.mkString(" "), s"doc ${r.getLong(0)}")
    }
  }

  // ------------------------------------------------- cluster keepers
  test("clusterKeepers: keep-best per near-dup cluster, ties to lower id, singletons keep themselves") {
    import graft.llm.Dedup
    val a = (0 until 20).map(j => s"alpha$j").mkString(" ")
    val b = (0 until 20).map(j => s"beta$j").mkString(" ")
    val docs = Seq(
      (1L, a, 100L), (2L, a, 100L), (3L, a + " extra", 110L), // keeper 3
      (7L, "a singleton about nothing shared with anything", 50L),
      (10L, b, 80L), (11L, b, 80L)) // equal scores: tie -> keeper 10
      .toDF("doc_id", "text", "score")
    val out = Dedup.clusterKeepers(docs, "doc_id", "text", "score")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out(1L) == ((1L, false)) && out(2L) == ((1L, false)))
    assert(out(3L) == ((1L, true)), "highest score wins the cluster")
    assert(out(7L) == ((7L, true)), "singleton keeps itself")
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)),
      "score tie breaks to the lower id")
  }

  // --------------------------------------- leakage split / soft dedup
  test("leakageSplit: near-dup clusters are split-atomic, singletons keyed on own id") {
    import graft.llm.{Corpus, Dedup}
    val d = Tables.load(spark, dir, "documents")
    val out = Dedup.leakageSplit(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == d.count())
    // every root maps to exactly one split (atomicity), and the split
    // is exactly Corpus.split of the root
    val byRoot = out.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    assert(byRoot.values.forall(_.length == 1), "cluster straddles a split")
    val expected = spark.createDataFrame(
        spark.sparkContext.parallelize(out.map(t => org.apache.spark.sql.Row(t._2)).toSeq),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("r",
            org.apache.spark.sql.types.LongType))))
      .select(Corpus.split(col("r")).as("s")).collect().map(_.getString(0))
    assert(out.map(_._3).sameElements(expected))
    // a clustered doc's root differs from its id for the non-min members
    val pairs = Dedup.lshPairs(d, "doc_id", "text").collect()
    assert(pairs.nonEmpty)
    val nonRoot = out.filter(t => t._1 != t._2)
    assert(nonRoot.nonEmpty, "expected planted near-dups to share a root")
  }

  test("softDedupWeights: cluster mass sums to 1, ESS matches the design-effect identity") {
    import graft.llm.Dedup
    val d = Tables.load(spark, dir, "documents")
    val out = Dedup.softDedupWeights(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == d.count())
    // per-cluster weight mass = 1 and cluster_size matches the group
    out.groupBy(_._2).foreach { case (cid, rows) =>
      assert(rows.forall(_._3 == rows.length), s"cluster $cid size mismatch")
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, s"cluster $cid mass")
    }
    val nClusters = out.map(_._2).distinct.length
    // total mass = #clusters exactly
    assert(math.abs(out.map(_._4).sum - nClusters) < 1e-9)
    // ESS = (Σw)²/Σw² = C²/Σ_c 1/k_c: between C and n, and equal to
    // the per-cluster-size reference
    val sw = out.map(_._4).sum
    val sw2 = out.map(w => w._4 * w._4).sum
    val ess = sw * sw / sw2
    val ref = {
      val sizes = out.groupBy(_._2).map(_._2.length)
      nClusters.toDouble * nClusters / sizes.map(1.0 / _).sum
    }
    assert(math.abs(ess - ref) < 1e-6, s"ESS $ess != reference $ref")
    assert(ess >= nClusters - 1e-9 && ess <= out.length + 1e-9)
    assert(out.forall(w => w._4 > 0 && w._4 <= 1.0))
  }

  // ------------------------------------------------ k-center coreset
  test("kCenterCoreset: greedy farthest-point order on a line") {
    val df = Seq(0L -> 0f, 1L -> 1f, 2L -> 2f, 3L -> 10f, 4L -> 20f)
      .map { case (id, x) => (id, Seq(x)) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Similarity.kCenterCoreset(df, k = 5).orderBy("sel_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    // seed 0 (min id); farthest 20 (d=400); then 10 (min d = 100);
    // then 2 (min(4, 64, 324) = 4); then 1 (min d = 1)
    assert(out.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 0L), (2L, 4L), (3L, 3L), (4L, 2L), (5L, 1L)))
    assert(out(0)._3.isEmpty)
    assert(out.drop(1).flatMap(_._3).toSeq == Seq(400.0, 100.0, 4.0, 1.0))
  }

  test("kCenterCoreset: distance ties break to the lower id; k beyond corpus stops") {
    val df = Seq((0L, Seq(0f)), (1L, Seq(5f)), (2L, Seq(5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Similarity.kCenterCoreset(df, k = 10).orderBy("sel_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L)))
  }

  test("kCenterCoreset: double-element embeddings accepted (same contract as dot)") {
    val df = Seq((0L, Seq(0.0)), (1L, Seq(3.0)), (2L, Seq(9.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(df, k = 2).orderBy("sel_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 2L)))
  }

  test("kCenterCoreset: lineage truncation does not change the selection") {
    val emb = Tables.load(spark, dir, "embeddings").limit(100)
    val a = Similarity.kCenterCoreset(emb, k = 6).orderBy("sel_rank")
      .collect().map(r => (r.getLong(1), Option(r.get(2)))).toSeq
    val b = Similarity.kCenterCoreset(emb, k = 6, truncateEvery = 2)
      .orderBy("sel_rank")
      .collect().map(r => (r.getLong(1), Option(r.get(2)))).toSeq
    assert(a == b)
  }

  test("kCenterCoreset: fixture embeddings match the greedy reference (same fold)") {
    val emb = Tables.load(spark, dir, "embeddings")
    val k = 8
    val got = Similarity.kCenterCoreset(emb, k).orderBy("sel_rank")
      .collect().map(_.getLong(1)).toSeq
    val pts = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    // the engine's exact arithmetic: |x|^2 + |c|^2 - 2*dot, ascending-
    // dim left fold, floats widened to double per element
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val xx = pts.map { case (_, v) => dot(v, v) }
    val n = pts.length
    val sel = scala.collection.mutable.ArrayBuffer(0) // min vec_id seed
    val dmin = Array.fill(n)(Double.PositiveInfinity)
    for (_ <- 2 to k) {
      val c = sel.last
      var best = -1
      for (i <- 0 until n if !sel.contains(i)) {
        val d = xx(i) + xx(c) - 2.0 * dot(pts(i)._2, pts(c)._2)
        if (d < dmin(i)) dmin(i) = d
        if (best < 0 || dmin(i) > dmin(best)) best = i
      }
      sel += best
    }
    assert(got == sel.map(i => pts(i)._1).toSeq)
  }
}
