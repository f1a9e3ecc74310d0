package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Incremental watermark ingestion (SURVEY.md §2.1 S5–S12, §2.3).
  *
  * Batch re-expression of the reference's cron pipeline
  * (helix-flow/dags/omni/transactions_dag.py:14-46): read the MAX(block)
  * watermark from the sink, detect a delta, fetch the `(last, current]`
  * key range from the source, filter `type_int == 200 AND data IS NOT
  * NULL`, hex-decode, derive blockdate, then append with an `insert_dt`
  * audit column. Two deliberate upgrades over the reference (SURVEY.md
  * §7.4): dedup by txid before the append, and an idempotent anti-join
  * against the sink so a retried run can never double-insert
  * (postgres_client.py:34-48 has no such key).
  *
  * At scale: the watermark read is a partition-pruned MAX over the
  * sink's `block` column (footer-only on block-sorted parquet); the
  * delta fetch is a key-range predicate pushed to the source; the
  * anti-join shuffles only the delta, never the sink history.
  */
object IncrementalPipeline {

  /** Source abstraction over the reference's RPC client
    * (omni_rpc_client.py:56-69): head block + key-range fetch. The
    * production impl would wrap an HTTP/JSON-RPC connector via
    * mapPartitions with bounded per-partition concurrency (S6); tests
    * use a parquet-backed source. */
  trait BlockSource {
    def currentBlock(): Long
    /** All raw tx rows with block ∈ (fromExclusive, toInclusive]. */
    def fetchRange(fromExclusive: Long, toInclusive: Long): DataFrame
  }

  final class FileBlockSource(spark: SparkSession, path: String) extends BlockSource {
    private lazy val df = spark.read.parquet(path)
    override def currentBlock(): Long =
      df.agg(coalesce(max(col("block")), lit(0L))).first().getLong(0)
    override def fetchRange(fromExclusive: Long, toInclusive: Long): DataFrame =
      df.filter(col("block") > fromExclusive && col("block") <= toInclusive)
  }

  /** S10: watermark = MAX(block) over the sink, null→0. */
  def readWatermark(spark: SparkSession, sinkPath: String): Long = {
    val exists = new java.io.File(sinkPath).exists()
    if (!exists) 0L
    else spark.read.parquet(sinkPath)
      .agg(coalesce(max(col("block")), lit(0L))).first().getLong(0)
  }

  /** S7+S8+S9: the row transform — filter, strict hex decode, blockdate
    * derivation (omni_rpc_client.py:100-126). */
  def transform(raw: DataFrame): DataFrame =
    raw.filter(col("type_int") === 200 && col("data").isNotNull)
      .withColumn("decoded_data", GraftFunctions.hexDecodeUtf8(col("data")))
      .withColumn("blockdate", GraftFunctions.epochToIso(col("blocktime")))

  final case class RunResult(lastBlock: Long, currentBlock: Long, appended: Long)

  /** One incremental run (the body of check_and_append_transactions,
    * transactions_dag.py:14-46). Returns what was appended; a no-delta
    * run is an early exit with zero work shipped to executors. */
  def runOnce(spark: SparkSession, source: BlockSource, sinkPath: String): RunResult = {
    val last = readWatermark(spark, sinkPath)
    val current = source.currentBlock()
    if (current <= last) return RunResult(last, current, 0L) // S11 early exit

    var delta = transform(source.fetchRange(last, current))
      .dropDuplicates("txid") // §2.3 upgrade: in-batch dedup

    // idempotent append: never re-insert txids already in the sink
    if (new java.io.File(sinkPath).exists()) {
      val existing = spark.read.parquet(sinkPath).select("txid")
      delta = delta.join(existing, Seq("txid"), "left_anti")
    }
    val toWrite = delta
      .withColumn("insert_dt", current_timestamp()) // S12 audit column
      .cache()
    val n = toWrite.count()
    if (n > 0)
      toWrite.write.mode(SaveMode.Append).parquet(sinkPath)
    toWrite.unpersist()
    RunResult(last, current, n)
  }
}
