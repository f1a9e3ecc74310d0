package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sql.StatementRunner
import graft.sql.StatementRunner._

class SqlRunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("splitter: top-level semicolons only; quotes and comments honored") {
    val script =
      """-- leading comment;
        |SELECT 'a;b' AS x;
        |/* block ; comment */ SELECT 1;
        |SELECT "q;uoted";
        |
        |;
        |SELECT 2""".stripMargin
    val stmts = splitStatements(script)
    assert(stmts.length == 4)
    assert(stmts(0).contains("'a;b'"))
    assert(stmts(1).contains("SELECT 1"))
    assert(stmts(2).contains("\"q;uoted\""))
    assert(stmts(3) == "SELECT 2")
  }

  test("splitter: escaped single quote, nested block comments") {
    val stmts = splitStatements("SELECT 'it''s;fine'; /* a /* nested; */ still */ SELECT 3")
    assert(stmts.length == 2)
    assert(stmts(0).contains("it''s;fine"))
  }

  test("property: generated scripts round-trip through the splitter") {
    // The splitter is a hand-rolled state machine (single/double quote,
    // line comment, NESTED block comment, escaped '' inside strings) —
    // exactly the token-boundary logic a generator covers better than
    // the two hand cases above. Build scripts as joined statements whose
    // tokens embed every separator-lookalike (semicolons inside quotes
    // and comments, -- and /* inside strings, '' escapes, nesting), plus
    // comment-only statements that must be dropped; the splitter must
    // return the real statements verbatim (modulo trim), in order.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("SELECT", "a", "col1", "1", "FROM", "t")
    val tricky = Gen.oneOf(
      "'a;b'", "'it''s;x'", "'x--y'", "'/*;*/'",
      "\"q;uote\"", "\"a--b\"",
      "/* a; b */", "/* a /* ;nested */ ; */",
      "-- c;omment\n")
    val token = Gen.frequency(2 -> word, 3 -> tricky)
    val stmt = for {
      n <- Gen.choose(0, 5)
      mid <- Gen.listOfN(n, token)
      first <- word; last <- word
    } yield (first +: mid :+ last).mkString(" ")
    val commentOnly = Gen.oneOf("/* dropped; */", "-- gone;\n", "  ", "")
    def draw[A](g: Gen[A], seed: Long, n: Int): Seq[A] = {
      var s = Seed(seed)
      (0 until n).map { _ =>
        val v = g.pureApply(Gen.Parameters.default, s); s = s.next; v
      }
    }
    for (trial <- 0 until 20) {
      val real = draw(stmt, 90L + trial, 5)
      val noise = draw(commentOnly, 900L + trial, 3)
      // interleave: r0 ; n0 ; r1 ; n1 ; ... (noise cycles so every real
      // statement survives the zip), then repeat two reals at the tail
      val script = (real.zipWithIndex
        .flatMap { case (r, i) => Seq(r, noise(i % noise.size)) }
        ++ real.drop(3))
        .mkString(";")
      val got = splitStatements(script)
      val expect = (real ++ real.drop(3)).map(_.trim)
      assert(got == expect, s"trial=$trial\nscript:\n$script")
    }
  }

  test("execute: multi-statement with fetch+limit; txn control warned not run") {
    val res = StatementRunner.execute(spark,
      """BEGIN;
        |SELECT 1 AS a UNION ALL SELECT 2 UNION ALL SELECT 3;
        |COMMIT;""".stripMargin,
      fetch = true, limit = Some(2))
    assert(res.statementsRun == 1)
    assert(res.warnings.size == 2)
    assert(res.fetched.get.collect().length == 2)
  }

  test("errors are classified; quoted fragments redacted") {
    val ex = intercept[SyntaxOrAnalysisError] {
      StatementRunner.execute(spark, "SELECT secret_col FROM nonexistent_table_xyz")
    }
    // value redaction applies to quoted message fragments (the reference
    // redacts row values, not identifiers — connections.py:72-75)
    assert(ex.getMessage.contains("<redacted>"))
    assert(ex.isInstanceOf[SyntaxOrAnalysisError])
  }

  test("redaction masks quoted values and long numerics") {
    val r = StatementRunner.redact("""error at 'sensitive row value' id 1234567 "col"""")
    assert(!r.contains("sensitive"))
    assert(!r.contains("1234567"))
  }

  test("cancel: a job group can be cancelled mid-flight") {
    import spark.implicits._
    val gid = "graft-cancel-test"
    @volatile var failed: Throwable = null
    val t = new Thread(() => {
      try StatementRunner.withJobGroup(spark, gid, "slow job") {
        spark.range(1L << 36).map { x => x }.count() // long-running
      } catch { case e: Throwable => failed = e }
    })
    t.start()
    Thread.sleep(1500)
    StatementRunner.cancel(spark, gid)
    t.join(30000)
    assert(!t.isAlive, "job thread should have terminated")
    assert(failed != null, "cancelled job should raise")
  }

  test("ctas: warehouse materialization is physical; drop removes it") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "grp")
      .createOrReplaceTempView("ctas_src")
    val wh = java.nio.file.Files.createTempDirectory("graft-whtest").toString
    val r = StatementRunner.execute(spark,
      """CREATE OR REPLACE TABLE grp_counts AS
        |  SELECT grp, COUNT(*) AS n FROM ctas_src GROUP BY grp;
        |SELECT grp, n FROM grp_counts ORDER BY grp;""".stripMargin,
      fetch = true, warehouse = Some(wh))
    assert(r.fetched.get.collect().map(x => (x.getString(0), x.getLong(1))).toSeq
      == Seq(("a", 2L), ("b", 1L)))
    // physically materialized: the table dir holds parquet files, and
    // the follow-up SELECT read them (not a re-run of the select)
    val tableDir = new java.io.File(wh, "grp_counts")
    assert(tableDir.exists() &&
      tableDir.listFiles().exists(_.getName.endsWith(".parquet")))
    assert(spark.table("grp_counts").queryExecution.optimizedPlan.toString
      .contains("Relation"), "table view must be parquet-backed")

    StatementRunner.execute(spark, "DROP TABLE grp_counts;", warehouse = Some(wh))
    assert(!tableDir.exists(), "drop must delete the materialization")
    assert(!spark.catalog.tableExists("grp_counts"))
  }

  test("ctas: without a warehouse degrades to a session view with a warning") {
    import spark.implicits._
    Seq(1, 2, 3).toDF("x").createOrReplaceTempView("ctas_src2")
    val r = StatementRunner.execute(spark,
      """CREATE TABLE doubled AS SELECT x * 2 AS y FROM ctas_src2;
        |SELECT CAST(SUM(y) AS BIGINT) AS s FROM doubled;""".stripMargin,
      fetch = true)
    assert(r.warnings.exists(_.contains("session view")), r.warnings.toString)
    assert(r.fetched.get.first().getLong(0) == 12L)
  }
}
