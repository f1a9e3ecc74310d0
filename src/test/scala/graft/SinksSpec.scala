package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{count, input_file_name, lit, max, min}

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

  test("email alerts: on_failure fires to all recipients, on_retry gated off") {
    val mt = new Sinks.CollectingMailTransport
    val ch = Sinks.EmailAlerts(mt, Seq("a@example.com", "b@example.com"))
    ch.alertFailure("dag=ingest run=42", "boom")
    ch.alertRetry("dag=ingest run=42", "retrying") // default onRetry=false
    assert(mt.sent.size == 1)
    val m = mt.sent.head
    assert(m.to == Seq("a@example.com", "b@example.com"))
    assert(m.subject.contains("FAILURE") && m.subject.contains("dag=ingest"))
    assert(m.body == "boom")
    // flipping the flag (email_on_retry: True) enables the retry channel
    val ch2 = ch.copy(onRetry = true)
    ch2.alertRetry("dag=ingest run=43", "retrying")
    assert(mt.sent.size == 2 && mt.sent.last.subject.contains("RETRY"))
  }

  test("smtp transport: full RFC 5321 dialogue against an in-JVM server") {
    import java.io.{BufferedReader, InputStreamReader, BufferedWriter, OutputStreamWriter}
    import java.nio.charset.StandardCharsets.US_ASCII
    val server = new java.net.ServerSocket(0)
    val received = new java.util.concurrent.atomic.AtomicReference[String]("")
    val rcpts = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream, US_ASCII))
      val out = new BufferedWriter(new OutputStreamWriter(s.getOutputStream, US_ASCII))
      def reply(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
      reply("220 stub ESMTP")
      var inData = false
      val data = new StringBuilder
      var line = in.readLine()
      while (line != null) {
        if (inData) {
          if (line == ".") { inData = false; received.set(data.toString); reply("250 ok") }
          else data.append(if (line.startsWith("..")) line.drop(1) else line).append("\n")
        } else line.takeWhile(_ != ' ').takeWhile(_ != ':').toUpperCase match {
          case "HELO" => reply("250-stub greets you"); reply("250 ok") // multiline reply
          case "MAIL" => reply("250 ok")
          case "RCPT" => rcpts.add(line); reply("250 ok")
          case "DATA" => inData = true; data.clear(); reply("354 go")
          case "QUIT" => reply("221 bye"); line = null
          case _ => reply("250 ok")
        }
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.start()
    try {
      val tr = new Sinks.SmtpTransport("127.0.0.1", server.getLocalPort)
      tr.send(Sinks.Email("graft@localhost", Seq("ops@example.com"),
        "[graft] FAILURE: q1", "line1\n.dot-led line\nline3"))
      t.join(10000)
      assert(rcpts.size == 1 && rcpts.get(0).contains("ops@example.com"))
      val msg = received.get()
      assert(msg.contains("Subject: [graft] FAILURE: q1"))
      assert(msg.contains(".dot-led line")) // dot-stuffing round-trips
      assert(msg.contains("line3"))
    } finally server.close()
  }

  test("compactParquet: small files merged, rows intact, second run no-ops") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(64).write.parquet(dir)
    def pqFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(pqFiles == 64)
    val (before, after) = graft.sinks.Layout.compactParquet(spark, dir,
      targetFileBytes = 1L << 30)
    assert(before == 64 && after == 1 && pqFiles == 1, s"$before -> $after")
    // content survived the swap bit-for-bit
    val back = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(back == (1 to 5000).map(i => (i.toLong, s"row$i")).toSet)
    // idempotent: already at target → untouched
    assert(graft.sinks.Layout.compactParquet(spark, dir,
      targetFileBytes = 1L << 30) == ((1, 1)))
    // no staging debris left behind
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(parent.toSeq == Seq("t"), parent.mkString(","))
  }

  test("writeClustered: per-file key ranges are disjoint (min/max stats prune)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cluster").toString + "/t"
    // write in hash-scrambled order — clustering must UNDO this
    val df = (1 to 10000).map(i => (i.toLong * 2654435761L % 100003, i))
      .toDF("k", "v")
    graft.sinks.Layout.writeClustered(df, dir, Seq("k"), numFiles = 8)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(perFile.length == 8, s"${perFile.length} files")
    assert(perFile.map(_._3).sum == 10000L)
    // intervals strictly ordered: file i's max < file i+1's min
    perFile.sliding(2).foreach { case Array((_, hi, _), (lo, _, _)) =>
      assert(hi < lo, s"overlapping file ranges: $hi >= $lo")
    case _ => }
  }
}
