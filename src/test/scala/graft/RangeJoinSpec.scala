package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bucketized interval join: exactness vs the naive range predicate,
  * including intervals that span multiple buckets and boundary times. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketized interval join equals the naive range join") {
    val left = Seq((1L, 5L, 100L), (1L, 999L, 101L), (1L, 1000L, 102L),
      (2L, 500L, 103L), (1L, 2500L, 104L))
      .toDF("k", "t", "lid")
    // intervals: one inside a bucket, one spanning 3 buckets (width 1000),
    // one on another key, bounds inclusive on both ends
    val right = Seq((1L, 0L, 999L, 10L), (1L, 900L, 2600L, 11L),
      (2L, 400L, 500L, 12L))
      .toDF("rk", "s", "e", "rid")
    val got = RangeJoin.intervalJoin(left, "k", "t",
      right, "rk", "s", "e", Seq("rid"), bucketWidthSec = 1000L)
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right,
      left("k") === right("rk") && left("t") >= right("s") && left("t") <= right("e"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((100L, 10L), (101L, 10L), (101L, 11L), (102L, 11L),
      (104L, 11L), (103L, 12L)))
  }

  test("no duplicate pairs when an interval spans many buckets") {
    val left = Seq((1L, 50L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 0L, 10000L, 9L)).toDF("rk", "s", "e", "rid")
    val n = RangeJoin.intervalJoin(left, "k", "t",
      right, "rk", "s", "e", Seq("rid"), bucketWidthSec = 10L).count()
    assert(n == 1L)
  }

  test("property: generated intervals match the naive join across bucket widths") {
    // The bucketization arithmetic (floor-divide bucket ids, the
    // explode sequence's inclusive endpoints, the one-bucket-per-left-
    // row dedup guarantee) is boundary logic a generator exercises
    // better than hand cases: negative times make floor≠truncate,
    // width 1 maximizes the explode factor, width 1000 collapses
    // everything into few buckets (candidate pressure), zero-length
    // intervals hit the single-bucket edge. Fixed seeds keep it
    // deterministic; each trial is a full set-equality vs the naive
    // O(|L|·|R|) scan PLUS a no-duplicate check (multiset, not set).
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def draw[A](g: Gen[A], seed: Long, n: Int): Seq[A] = {
      var s = Seed(seed)
      (0 until n).map { _ =>
        val v = g.pureApply(Gen.Parameters.default, s); s = s.next; v
      }
    }
    val instant = for {
      k <- Gen.choose(1L, 3L); t <- Gen.choose(-50L, 50L)
    } yield (k, t)
    val interval = for {
      k <- Gen.choose(1L, 3L); s0 <- Gen.choose(-50L, 50L)
      len <- Gen.choose(0L, 30L)
    } yield (k, s0, s0 + len)
    for (width <- Seq(1L, 7L, 1000L); trial <- 0 until 2) {
      val ls = draw(instant, 11L * width + trial, 60).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = draw(interval, 77L * width + trial, 40).zipWithIndex
        .map { case ((k, s0, e0), i) => (k, s0, e0, 1000L + i) }
      val got = RangeJoin.intervalJoin(
        ls.toDF("k", "t", "lid"), "k", "t",
        rs.toDF("rk", "s", "e", "rid"), "rk", "s", "e",
        Seq("rid"), bucketWidthSec = width)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val naive = for {
        (k, t, lid) <- ls; (rk, s0, e0, rid) <- rs
        if k == rk && t >= s0 && t <= e0
      } yield (lid, rid)
      assert(got.size == got.toSet.size,
        s"duplicate pairs at width=$width trial=$trial")
      assert(got.toSet == naive.toSet, s"width=$width trial=$trial")
    }
  }
}
