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

  private def renderSlackBlock(text: String): String = {
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n")
    s"""{"blocks":[{"type":"section","text":{"type":"mrkdwn","text":"${esc(text)}"}}]}"""
  }
}
