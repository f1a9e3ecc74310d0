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
}
