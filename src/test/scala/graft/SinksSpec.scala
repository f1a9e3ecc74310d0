package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.catalog.DefaultRegistry
import graft.planner.MetricPlanner

class SinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("csv sink writes a single header file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    Sinks.csv(Seq((1, "a"), (2, "b")).toDF("id", "name"), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = Files.readAllLines(files(0).toPath)
    assert(lines.get(0) == "id,name")
    assert(lines.size == 3)
  }

  test("sql dump writes one file per fan-out query (S20/M11)") {
    val planner = new MetricPlanner(DefaultRegistry.registry)
    val dir = Files.createTempDirectory("graft-sqldump").toString
    val dumps = planner.dumpQueries("revenue").map(d => (d._1, d._3))
    val written = Sinks.sqlDump(dir, dumps)
    assert(written.nonEmpty && written.forall(p => Files.exists(Paths.get(p))))
    val one = Files.readString(Paths.get(dir, "revenue_by_r_name.sql"))
    assert(one.contains("GROUP BY") && one.contains("r_name"))
  }

  test("report notify: pipe-delimited projection, 3000-char chunks") {
    import spark.implicits._
    val wh = new Sinks.CollectingWebhook
    val df = (1 to 200).map(i => (s"tx$i", s"0.$i", "data" * 10, "2024-01-01"))
      .toDF("txid", "fee", "decoded_data", "blockdate")
    val n = Sinks.notifyReport(df, Seq("txid", "fee", "decoded_data", "blockdate"),
      wh, sampleRows = 100, chunkSize = 3000)
    assert(n == wh.posted.size && n >= 1)
    assert(wh.posted.forall(_.startsWith("""{"blocks":[{"type":"section""")))
    assert(wh.posted.head.contains("tx1 | 0.1 |"))
    // chunk bound respected pre-escaping
    assert(wh.posted.forall(_.length < 3000 * 2 + 200))
  }

  test("empty result -> no webhook post (early exit, slack_utils.py:74-75)") {
    import spark.implicits._
    val wh = new Sinks.CollectingWebhook
    val df = Seq.empty[(String, String)].toDF("txid", "fee")
    assert(Sinks.notifyReport(df, Seq("txid", "fee"), wh) == 0)
    assert(wh.posted.isEmpty)
  }

  test("alert renders context + error as a slack block") {
    val wh = new Sinks.CollectingWebhook
    Sinks.notifyAlert("dag=ingest run=42", "boom", wh)
    assert(wh.posted.size == 1 && wh.posted.head.contains("ALERT"))
  }
}
