package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.DataChecks

/** dbt-style generic tests: planted failures produce dbt's exact
  * counts; clean data passes; per-table checks share one scan. */
class DataChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dirty = {
    import spark.implicits._
    Seq(
      (Some(1L), Some("O"), Some(10L)),
      (Some(2L), Some("F"), Some(20L)),
      (Some(2L), Some("P"), Some(20L)),  // dup id, bad status
      (None, Some("P"), None),           // null id, bad status, null ref
      (Some(3L), None, Some(99L))        // null status (not accepted's concern), orphan ref
    ).toDF("id", "status", "ref")
  }

  test("planted failures: dbt semantics per check") {
    import spark.implicits._
    val parents = Seq(10L, 20L).toDF("pid")
    val res = DataChecks.suite(Seq(
      DataChecks.tableChecks(dirty, "t", notNullCols = Seq("id"),
        accepted = Map("status" -> Seq("O", "F"))),
      DataChecks.unique(dirty, "t", Seq("id")),
      DataChecks.relationships(dirty, "t", "ref", parents, "pid")))
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(res(("not_null", "id")) == (1L, false))
    // two bad-status rows; the null status row is NOT counted here
    assert(res(("accepted_values", "status")) == (2L, false))
    // dbt unique counts VALUES duplicated, not excess rows: id=2 once.
    // null ids form a group too — both Spark groupBy and dbt's GROUP BY
    // treat null as a value; only one null here, so no extra failure
    assert(res(("unique", "id")) == (1L, false))
    // one non-null ref (99) without a parent; null ref not counted
    assert(res(("relationships", "ref -> pid")) == (1L, false))
  }

  test("clean data passes every check") {
    import spark.implicits._
    val clean = Seq((1L, "O", 10L), (2L, "F", 20L)).toDF("id", "status", "ref")
    val parents = Seq(10L, 20L).toDF("pid")
    val res = DataChecks.suite(Seq(
      DataChecks.tableChecks(clean, "t", Seq("id"), Map("status" -> Seq("O", "F"))),
      DataChecks.unique(clean, "t", Seq("id")),
      DataChecks.relationships(clean, "t", "ref", parents, "pid")))
      .collect()
    assert(res.length == 4 && res.forall(_.getBoolean(4)))
    assert(res.forall(_.getLong(3) == 0L))
  }

  test("per-table not_null + accepted_values share ONE scan") {
    val checks = DataChecks.tableChecks(dirty, "t",
      notNullCols = Seq("id", "ref"), accepted = Map("status" -> Seq("O", "F")))
    val scans = checks.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan"))
    assert(scans <= 1, s"expected a single scan, plan had $scans")
  }

  test("source freshness: pass/warn/error windows and the empty-source case") {
    import spark.implicits._
    def ev(ts: String) = Seq(Tuple1(java.sql.Timestamp.valueOf(ts)))
      .toDF("loaded_at")
    val asOf = lit("2024-01-01 12:00:00")
    def status(df: org.apache.spark.sql.DataFrame) =
      DataChecks.freshness(df, "t", "loaded_at", asOf,
        warnAfterSec = 3600, errorAfterSec = 86400)
        .collect().head
    assert(status(ev("2024-01-01 11:30:00")).getString(3) == "pass")
    val w = status(ev("2024-01-01 09:00:00"))
    assert(w.getString(3) == "warn" && w.getLong(2) == 3 * 3600)
    assert(status(ev("2023-12-30 00:00:00")).getString(3) == "error")
    // a source that never loaded anything is an error, not a pass
    val empty = Seq.empty[Tuple1[java.sql.Timestamp]].toDF("loaded_at")
    assert(status(empty).getString(3) == "error")
  }

  test("empty table: zero failures, not nulls") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "status")
    val res = DataChecks.tableChecks(empty, "t", Seq("id"),
      Map("status" -> Seq("O"))).collect()
    assert(res.forall(r => r.getLong(3) == 0L && r.getBoolean(4)))
  }
}
