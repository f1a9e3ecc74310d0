package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet-backed table loader over a scale-factor directory.
  *
  * The reference reads named warehouse tables (e.g.
  * `omni.self_testnet_transactions`, helix-flow/dags/omni/transactions_dag.py:22-25)
  * and materializes SQL results as frames
  * (helix-flow/utils/postgres_client.py:50-52). Here every table is a
  * columnar Parquet scan so Catalyst gets predicate pushdown, column
  * pruning and partition pruning for free — at 100 TB these tables would
  * be date/key-partitioned directories; the loader contract is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; read it as epoch-nanos LONG and convert to a
    // micros timestamp (exact integer division — no precision surprise).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val withTs =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      else df
    normalizeNtz(withTs)
  }

  /** Normalize every TIMESTAMP_NTZ column to a session-TZ TIMESTAMP at
    * the source boundary. Parquet writers vary in the
    * `isAdjustedToUTC` logical-type flag (the same fixture has shipped
    * as NANOS, MICROS-UTC and MICROS-local across driver versions);
    * downstream the engine is instant-based — `withWatermark` rejects
    * NTZ event time and `Row.getTimestamp` expects an instant. The
    * session timezone is pinned to UTC, so the wall-clock → instant
    * reinterpretation is unambiguous. One narrow projection, no
    * shuffle — at 100 TB this rides the scan. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else df.select(df.schema.fieldNames.map { f =>
      if (ntz.exists(_.name == f)) col(f).cast(TimestampType).as(f)
      else col(f)
    }.toIndexedSeq: _*)
  }

  /** Load with a scan-parallelism floor: repartition to the session's
    * default parallelism. The driver fixtures are single-row-group
    * Parquet files, which Spark cannot split — every downstream map
    * stage would otherwise run on ONE core out of 32. On a real cluster
    * the same situation arises whenever a source hands over few huge
    * unsplittable files (single large row groups, gzip CSV, one kafka
    * partition); the fix is the same: one cheap round-robin exchange of
    * the raw rows buys full-width parallelism for every compute-dense
    * stage after it. Use [[load]] when the downstream work is a plain
    * scan-aggregate (the exchange would cost more than it saves). */
  def loadP(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)

  /** CSV source with an explicit schema (header row, RFC quoting).
    * Schema is REQUIRED, not inferred: inference reads the data twice
    * and guesses — a 100 TB ingest declares its contract up front.
    * PERMISSIVE mode + a corrupt-record column quarantines bad lines
    * instead of failing the batch. */
  def loadCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** JSON-lines source with an explicit schema — the reference's
    * ingestion shape (sparse JSON-RPC dicts, omni_rpc_client.py:100-114):
    * absent keys become nulls, unknown keys are ignored, corrupt lines
    * are quarantined. */
  def loadJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** ORC source (columnar alternative to parquet; Spark's reader does
    * the same predicate pushdown / column pruning / vectorized scan).
    * Schema comes from the ORC footer — self-describing like parquet,
    * no inference pass. */
  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JDBC table source (S1's warehouse shape — the reference reads
    * named warehouse tables over a DB connection). Single-partition
    * read; prefer [[loadJdbcPartitioned]] for anything big. */
  def loadJdbc(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc").options(options)
      .option("url", url).option("dbtable", table).load()

  /** Range-partitioned JDBC read — the 100 TB shape: `numPartitions`
    * executors each issue `WHERE col BETWEEN ...` slices concurrently
    * instead of one connection streaming the whole table through the
    * driver-side of the scan. Bounds are min/max of the partition
    * column (fetch them with a cheap aggregate first if unknown). */
  def loadJdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc").options(options)
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions).load()

  /** Register every table as a temp view so `spark.sql` works on the
    * same names the DuckDB oracle uses. Plain loads: SQL-surface
    * queries are scan-aggregate/join shaped, where a blanket
    * parallelism-floor exchange measured slower than the narrow scan
    * (the floor pays only for digest-heavy operators — see [[loadP]]).
    * Idempotent per session+dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
