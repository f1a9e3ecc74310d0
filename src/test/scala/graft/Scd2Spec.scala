package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Scd2

/** dbt snapshots (SCD2 check strategy): version transitions, stale
  * untracked payload, hard deletes, NULL-safe change detection,
  * point-in-time reads, and three-fold chains. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def row(r: org.apache.spark.sql.Row) =
    (r.getLong(0), Option(r.getString(1)), Option(r.getTimestamp(3)).map(_.toString),
      Option(r.getTimestamp(4)).map(_.toString))

  test("changed keys version, unchanged keep stale payload, new keys insert") {
    import spark.implicits._
    val s1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "extra")
    val s2 = Seq((1L, "a", 99L), (2L, "B", 21L), (3L, "c", 30L)).toDF("k", "v", "extra")
    val snap = Scd2.apply(Scd2.initial(s1, lit("2024-01-01")), s2,
      "k", Seq("v"), lit("2024-02-01"))
      .orderBy("k", "valid_from").collect()
    val got = snap.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getTimestamp(3).toString.take(10),
      Option(r.getTimestamp(4)).map(_.toString.take(10)).orNull))
    assert(got.toSeq == Seq(
      // unchanged v -> original row kept, STALE extra=10 (dbt check semantics)
      (1L, "a", 10L, "2024-01-01", null),
      (2L, "b", 20L, "2024-01-01", "2024-02-01"),
      (2L, "B", 21L, "2024-02-01", null),
      (3L, "c", 30L, "2024-02-01", null)))
  }

  test("hard deletes: kept open by default, closed with invalidateHardDeletes") {
    import spark.implicits._
    val s1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val s2 = Seq((1L, "a")).toDF("k", "v") // key 2 vanished
    val base = Scd2.initial(s1, lit("2024-01-01"))
    val kept = Scd2.apply(base, s2, "k", Seq("v"), lit("2024-02-01"))
      .filter(col("k") === 2).collect()
    assert(kept.length == 1 && kept.head.isNullAt(3), "default keeps deletes open")
    val closed = Scd2.apply(base, s2, "k", Seq("v"), lit("2024-02-01"),
      invalidateHardDeletes = true).filter(col("k") === 2).collect()
    assert(closed.length == 1 && !closed.head.isNullAt(3),
      "invalidate_hard_deletes closes the version")
  }

  test("NULL-safe change detection: null->value and value->null version correctly") {
    import spark.implicits._
    val s1 = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("k", "v")
    val s2 = Seq((1L, Some("y")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("k", "v")
    val snap = Scd2.apply(Scd2.initial(s1, lit("2024-01-01")), s2,
      "k", Seq("v"), lit("2024-02-01"))
    // k=1 and k=2 changed (2 versions each); k=3 null==null unchanged (1)
    val counts = snap.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("three folds chain; asOfRead returns each era's version; closed history immutable") {
    import spark.implicits._
    def st(v: String) = Seq((1L, v)).toDF("k", "v")
    val snap = Scd2.apply(
      Scd2.apply(Scd2.initial(st("a"), lit("2024-01-01")),
        st("b"), "k", Seq("v"), lit("2024-02-01")),
      st("c"), "k", Seq("v"), lit("2024-03-01"))
    assert(snap.count() == 3)
    def at(ts: String) = Scd2.asOfRead(snap, lit(ts).cast("timestamp"))
      .select("v").collect().map(_.getString(0)).toSeq
    assert(at("2024-01-15") == Seq("a"))
    assert(at("2024-02-15") == Seq("b"))
    assert(at("2024-03-15") == Seq("c"))
    // before the first snapshot: nothing valid yet
    assert(at("2023-12-15").isEmpty)
    // exactly one open version
    assert(snap.filter(col("valid_to").isNull).count() == 1)
  }
}
