package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{BloomFilter, Dsir}

class BloomDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bloom: no false negatives on members, FPs visible at small m") {
    import spark.implicits._
    val members = (1L to 200L).map(i => s"key-$i").toDF("k")
    val sketch = BloomFilter.build(members, col("k"), k = 7, m = 1 << 10)
    // every member probes true — the no-false-negative guarantee
    val onMembers = BloomFilter.mightContain(sketch, members, "k", col("k"),
      k = 7, m = 1 << 10).collect()
    assert(onMembers.length == 200)
    assert(onMembers.forall(_.getAs[Boolean]("might_contain")))
    // at 200 keys × 7 bits into 1024 bits the filter is saturated
    // enough that some non-members must collide (deterministic: md5)
    val others = (1001L to 1200L).map(i => s"other-$i").toDF("k")
    val onOthers = BloomFilter.mightContain(sketch, others, "k", col("k"),
      k = 7, m = 1 << 10).collect()
    val fps = onOthers.count(_.getAs[Boolean]("might_contain"))
    assert(fps > 0 && fps < 200, s"expected some-but-not-all FPs, got $fps")
  }

  test("bloom: merged shard filters equal the filter of the union") {
    import spark.implicits._
    val a = (1L to 100L).map(i => s"k$i").toDF("k")
    val b = (80L to 180L).map(i => s"k$i").toDF("k")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = BloomFilter.merge(
      BloomFilter.build(a, col("k"), 5, 1 << 9),
      BloomFilter.build(b, col("k"), 5, 1 << 9))
    val whole = BloomFilter.build(a.unionAll(b), col("k"), 5, 1 << 9)
    assert(rows(merged) == rows(whole))
  }

  test("bloom: seenWindowStats flags a planted seen doc, bloom >= exact") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val existing = Seq((1L, base), (2L, "completely unrelated corpus text here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                               // fully seen
      (11L, "fresh novel content nothing like anything prior in any shard"))
      .toDF("doc_id", "text")
    val out = BloomFilter.seenWindowStats(existing, batch, "doc_id", "text",
      windowTokens = 8, k = 7, m = 1 << 17)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_bloom_hits"),
          r.getAs[Long]("n_exact_hits"))).toMap
    val (w10, b10, e10) = out(10L)
    assert(w10 > 0 && e10 == w10 && b10 == w10,
      "planted duplicate: every window exact-hit and bloom-hit")
    val (_, b11, e11) = out(11L)
    assert(e11 == 0L, "novel doc has no exact hits")
    // invariant everywhere: no false negatives
    assert(out.values.forall { case (_, b, e) => b >= e })
    assert(b11 >= 0L)
  }

  test("dsir: target-like docs upweighted; gumbel selection deterministic") {
    import spark.implicits._
    val en = "the cat sat on the mat and the dog ran to the park with the ball"
    val xx = "zzz qqq vvv kkk www jjj xxx yyy hhh ggg fff ddd sss aaa bbb ccc"
    // doc i repeats the target phrase i times, so target-like content
    // (and hence logw) strictly increases with i — distinct weights,
    // which the tau->0 degeneracy check below needs
    val docs = (
      (1L to 20L).map(i => (i, (en + " ") * i.toInt + s"extra $i", "en")) ++
      (21L to 40L).map(i => (i, xx + s" extra $i", "xx"))
    ).toDF("doc_id", "text", "lang")
    val wts = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", b = 256)
    val byId = wts.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val enMin = (1L to 20L).map(byId).min
    val xxMax = (21L to 40L).map(byId).max
    assert(enMin > xxMax, s"target-like min $enMin should beat non-target max $xxMax")
    // deterministic across partitioning: md5-derived gumbel + order-pinned fold
    val sel1 = Dsir.gumbelTopK(wts, "doc_id", 10).collect().map(_.getLong(0)).toSeq
    val sel2 = Dsir.gumbelTopK(wts.repartition(7), "doc_id", 10)
      .collect().map(_.getLong(0)).toSeq
    assert(sel1 == sel2)
    // tau -> 0 degenerates to plain top-k by weight
    val cold = Dsir.gumbelTopK(wts, "doc_id", 10, temperature = 1e-9)
      .collect().map(_.getLong(0)).toSet
    val topByW = byId.toSeq.sortBy { case (id, w) => (-w, id) }.take(10)
      .map(_._1).toSet
    assert(cold == topByW)
  }
}
