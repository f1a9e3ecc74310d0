package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoinNative
import graft.sources.Tables

/** Native as-of join (custom LogicalPlan + SparkStrategy + merge
  * SparkPlan): result equivalence with the composed operator and the
  * promised physical shape. */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  private def markers = Tables.load(spark, dir, "events")
    .filter(col("event_type") === "error")
    .groupBy(col("user_id").as("m_user"), col("ts").as("m_ts"))
    .agg(max(col("event_id")).as("marker_id"))
  private def left = Tables.load(spark, dir, "events")
    .filter(col("event_type") =!= "error")
    .select(col("event_id"), col("user_id"), col("ts"))

  test("native as-of equals the composed window formulation") {
    val native = AsOfJoinNative.asOf(left, "user_id", "ts",
      markers, "m_user", "m_ts", Seq("marker_id"))
      .select("event_id", "user_id", "marker_id")
    val composed = operators.AsOfJoin.asOf(left, "user_id", "ts",
      markers, "m_user", "m_ts", Seq("marker_id"))
      .select("event_id", "user_id", "marker_id")
    assert(native.count() > 0)
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }

  test("hand case: inclusive bound, latest-wins, inner semantics") {
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_seconds(col("t")).as("t"), col("lid"))
    val r = Seq((1L, 10L, 7L), (1L, 15L, 8L), (3L, 1L, 9L))
      .toDF("k", "t", "pid")
      .select(col("k").as("rk"), timestamp_seconds(col("t")).as("rt"), col("pid"))
    val out = AsOfJoinNative.asOf(l, "k", "t", r, "rk", "rt", Seq("pid"))
      .select("lid", "pid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // lid=100 matches pid=7 (equal time inclusive); lid=101 matches the
    // LATEST at-or-before (pid=8); lid=102 (key 2) has no match → drops
    assert(out == Set((100L, 7L), (101L, 8L)))
  }

  test("property: generated corpora — native and composed equal brute force") {
    // The merge pass's buffered-state advance ("emit the LATEST right
    // row at-or-before each left time") is classic off-by-one
    // territory: equal timestamps (inclusive bound), several left rows
    // between two right rows (state must persist, not advance), a left
    // row before any right row (inner semantics drop), keys present on
    // one side only. Small key space + clustered times force all of
    // these per trial; brute force recomputes the contract directly.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def draw[A](g: Gen[A], seed: Long, n: Int): Seq[A] = {
      var s = Seed(seed)
      (0 until n).map { _ =>
        val v = g.pureApply(Gen.Parameters.default, s); s = s.next; v
      }
    }
    val ev = for {
      k <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 60L)
    } yield (k, t)
    for (trial <- 0 until 3) {
      val ls = draw(ev, 5L + trial, 50).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
      // contract: right side unique on (key, time) — dedupe like the
      // q61 marker pre-aggregation does (max payload wins)
      val rs = draw(ev, 500L + trial, 30).zipWithIndex
        .map { case ((k, t), i) => (k, t, 1000L + i) }
        .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
      val l = ls.toDF("k", "t", "lid")
        .select(col("k"), timestamp_seconds(col("t")).as("t"), col("lid"))
      val r = rs.toDF("rk", "rt", "pid")
        .select(col("rk"), timestamp_seconds(col("rt")).as("rt"), col("pid"))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "pid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
      val native = pairs(
        AsOfJoinNative.asOf(l, "k", "t", r, "rk", "rt", Seq("pid")))
      val composed = pairs(
        operators.AsOfJoin.asOf(l, "k", "t", r, "rk", "rt", Seq("pid")))
      val brute = ls.flatMap { case (k, t, lid) =>
        val cand = rs.filter(x => x._1 == k && x._2 <= t)
        if (cand.isEmpty) None else Some((lid, cand.maxBy(_._2)._3))
      }.toSet
      assert(native == brute, s"native != brute at trial=$trial")
      assert(composed == brute, s"composed != brute at trial=$trial")
    }
  }

  test("physical plan: AsOfJoinExec with one hash exchange per side") {
    val df = AsOfJoinNative.asOf(left, "user_id", "ts",
      markers, "m_user", "m_ts", Seq("marker_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    // the operator itself adds exactly one exchange per child (the
    // marker pre-dedup groupBy reuses the right side's exchange)
    val n = plan.split("Exchange hashpartitioning").length - 1
    assert(n <= 3, s"saw $n hash exchanges\n${plan.take(3000)}")
  }

  test("strategy is injected by GraftExtensions sessions too") {
    // runtime path (ensureStrategy) is exercised above; here just
    // confirm the extension class wires the strategy without error
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // throws if injection signature regresses
    succeed
  }
}
