package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small operators closing the SURVEY.md §2.1 inventory tail:
  * S16 (cross-task value passing), S21 (source health probe),
  * S26 (type-code → name mapping), S27 (connection registry). */
object MiscOps {

  /** S16: the reference passes values between pipeline stages via
    * Airflow XCom (transactions_dag.py:36); the Spark-native analogue
    * is `df.observe` — named metrics collected as a side product of the
    * action that runs anyway (no extra job, unlike a separate count). */
  def withObservedCount(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    (df.observe(obs, count(lit(1)).as("n_rows"),
      sum(lit(1L)).as("n_rows_sum")), obs)
  }

  /** S21: source liveness probe (beta_ipfs_node_ping_dag.py:8-21) —
    * a bounded-cost availability check before launching a big job. */
  final case class SourceDown(path: String, cause: Throwable)
    extends RuntimeException(s"source unavailable: $path", cause)

  def checkSourceUp(spark: SparkSession, path: String): Unit =
    try { spark.read.parquet(path).limit(1).count(); () }
    catch { case e: Throwable => throw SourceDown(path, e) }

  /** S26: type-code → name mapping (connections.py:475-478); Spark's
    * schema already carries names — expose the same lookup shape. */
  def columnTypeNames(df: DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  /** S27: idempotent named-connection registry
    * (manage_connections.py:5-22) over spark.conf; secrets stay in env,
    * only references are stored. */
  final class ConnectionRegistry(spark: SparkSession) {
    private def key(id: String) = s"graft.connection.$id"
    /** Create-if-absent; returns true when newly created. */
    def createIfAbsent(id: String, connType: String, secretEnvVar: String): Boolean =
      spark.conf.getOption(key(id)) match {
        case Some(_) => false
        case None =>
          spark.conf.set(key(id), s"$connType:env:$secretEnvVar"); true
      }
    def get(id: String): Option[(String, String)] =
      spark.conf.getOption(key(id)).map { v =>
        val parts = v.split(":env:"); (parts(0), parts(1))
      }
  }
}
