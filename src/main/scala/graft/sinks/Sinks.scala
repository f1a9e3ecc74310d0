package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink library (SURVEY.md §2.1 S12/S13/S14/S15/S19/S20). */
object Sinks {

  /** S12: append with `insert_dt` audit column
    * (postgres_client.py:34-48). */
  def appendWithAudit(df: DataFrame, path: String): Unit =
    df.withColumn("insert_dt", current_timestamp())
      .write.mode(SaveMode.Append).parquet(path)

  /** S12 production target: JDBC append with the audit column
    * (postgres_client.py:34-52 appends a pandas frame to Postgres with
    * insert_dt). Executor-parallel batched INSERTs; pair with
    * [[graft.ingest.IncrementalPipeline.JdbcTxSink]] for the
    * watermark + idempotent cycle. */
  def appendJdbc(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.withColumn("insert_dt", current_timestamp())
      .write.format("jdbc").options(options)
      .option("url", url).option("dbtable", table)
      .mode(SaveMode.Append).save()

  /** S19: single-file CSV with header (dbt_query.py:141-147). */
  def csv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** JSON-lines sink — the write side of `Tables.loadJsonl` (the
    * interchange format every downstream tokenizer/training job
    * reads). Partitioned write; this is a data sink, not a
    * driver-sized report like [[csv]]. */
  def jsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC sink — columnar alternative to the parquet sinks, same
    * footer-stats pruning story at read time. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** S20: SQL-dump sink — write rendered SQL per name to `<name>.sql`
    * (dbt_query.py:162-183, dbt_query2.py:42-80). */
  def sqlDump(dir: String, rendered: Seq[(String, String)]): Seq[String] = {
    Files.createDirectories(Paths.get(dir))
    rendered.map { case (name, sql) =>
      val p = Paths.get(dir, s"$name.sql")
      Files.writeString(p, sql + "\n")
      p.toString
    }
  }

  /** Webhook transport abstraction so tests observe payloads without a
    * network (the reference POSTs Slack blocks, slack_utils.py:39-113).
    * Production impl = java.net.http.HttpClient on the driver inside
    * foreachBatch — notification volume is rows-limited, never
    * data-scale. */
  trait Webhook { def post(payload: String): Unit }
  final class CollectingWebhook extends Webhook {
    val posted = scala.collection.mutable.ListBuffer[String]()
    override def post(payload: String): Unit = posted += payload
  }

  /** S13+S14+S15: report formatter — pipe-delimited projection of up to
    * `sampleRows` rows, chunked to `chunkSize` chars, one webhook post
    * per chunk (slack_utils.py:66-113: 3000-char chunks, pipe rows). */
  def notifyReport(df: DataFrame, cols: Seq[String], webhook: Webhook,
      sampleRows: Int = 50, chunkSize: Int = 3000): Int = {
    val sample = df.select(cols.map(col): _*).limit(sampleRows).collect()
    val body = sample.map(_.toSeq.map(v => if (v == null) "" else v.toString)
      .mkString(" | ")).mkString("\n")
    val chunks =
      if (body.isEmpty) Seq.empty
      else body.grouped(chunkSize).toSeq
    chunks.foreach(c => webhook.post(renderSlackBlock(c)))
    chunks.size
  }

  /** S15 alert shape: failure context as a single block. */
  def notifyAlert(context: String, error: String, webhook: Webhook): Unit =
    webhook.post(renderSlackBlock(s"ALERT: $context\n$error"))

  // ----------------------------------------------------------- email
  /** The reference's second alert channel is email
    * (transactions_dag.py:52-54: `email_on_failure: True`,
    * `email_on_retry: False`, `email: [...]`). Same injectable-transport
    * shape as [[Webhook]]; production transport is [[SmtpTransport]], a
    * zero-dependency RFC 5321 client. Notification volume is per-failure,
    * never data-scale, so all of this runs on the driver. */
  final case class Email(from: String, to: Seq[String], subject: String,
      body: String)

  trait MailTransport { def send(msg: Email): Unit }

  final class CollectingMailTransport extends MailTransport {
    val sent = scala.collection.mutable.ListBuffer[Email]()
    override def send(msg: Email): Unit = sent += msg
  }

  /** Minimal SMTP submission over a raw socket (HELO / MAIL FROM /
    * RCPT TO / DATA / QUIT), with multiline-reply handling and
    * leading-dot stuffing per RFC 5321 §4.5.2. No TLS/auth — this
    * targets a local relay (the usual cluster-edge setup, and what
    * Airflow's default SMTP config assumes). */
  final class SmtpTransport(host: String, port: Int = 25,
      timeoutMs: Int = 10000) extends MailTransport {
    override def send(msg: Email): Unit = {
      val sock = new java.net.Socket()
      try {
        sock.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
        sock.setSoTimeout(timeoutMs)
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          sock.getInputStream, java.nio.charset.StandardCharsets.US_ASCII))
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          sock.getOutputStream, java.nio.charset.StandardCharsets.US_ASCII))
        def expect(code: String): Unit = {
          var line = in.readLine()
          while (line != null && line.length >= 4 && line.charAt(3) == '-')
            line = in.readLine() // skip multiline continuation replies
          if (line == null || !line.startsWith(code))
            throw new java.io.IOException(s"SMTP: expected $code, got $line")
        }
        def cmd(s: String, code: String): Unit = {
          out.write(s); out.write("\r\n"); out.flush(); expect(code)
        }
        expect("220")
        cmd("HELO graft", "250")
        cmd(s"MAIL FROM:<${msg.from}>", "250")
        msg.to.foreach(r => cmd(s"RCPT TO:<$r>", "250"))
        cmd("DATA", "354")
        val headers = s"From: ${msg.from}\r\nTo: ${msg.to.mkString(", ")}\r\n" +
          s"Subject: ${msg.subject}\r\n\r\n"
        val stuffed = msg.body.split("\n", -1)
          .map(l => if (l.startsWith(".")) "." + l else l).mkString("\r\n")
        out.write(headers + stuffed + "\r\n.\r\n"); out.flush(); expect("250")
        cmd("QUIT", "221")
      } finally sock.close()
    }
  }

  /** Unified alert-channel interface: Airflow fires task-failure and
    * task-retry callbacks to Slack and/or email; both impls below plug
    * into [[graft.streaming.StreamingPipeline.AlertListener]] and any
    * orchestration wrapper. */
  trait AlertChannel {
    def alertFailure(context: String, error: String): Unit
    def alertRetry(context: String, error: String): Unit = ()
  }

  /** Slack-webhook channel (transactions_dag.py:76-77
    * on_failure_callback → slack alert). */
  final case class WebhookAlerts(webhook: Webhook) extends AlertChannel {
    override def alertFailure(context: String, error: String): Unit =
      notifyAlert(context, error, webhook)
  }

  /** Email channel with the reference's gating flags
    * (`email_on_failure` / `email_on_retry`, transactions_dag.py:52-53). */
  final case class EmailAlerts(transport: MailTransport,
      recipients: Seq[String], from: String = "graft@localhost",
      onFailure: Boolean = true, onRetry: Boolean = false)
    extends AlertChannel {
    override def alertFailure(context: String, error: String): Unit =
      if (onFailure)
        transport.send(Email(from, recipients,
          s"[graft] FAILURE: $context", error))
    override def alertRetry(context: String, error: String): Unit =
      if (onRetry)
        transport.send(Email(from, recipients,
          s"[graft] RETRY: $context", error))
  }

  private def renderSlackBlock(text: String): String = {
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n")
    s"""{"blocks":[{"type":"section","text":{"type":"mrkdwn","text":"${esc(text)}"}}]}"""
  }
}
