package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.IncrementalPipeline.RpcBlockSource

/** Streaming-NATIVE RPC ingestion (SURVEY.md §2.3): the JSON-RPC block
  * source as a DataSource-V2 `MicroBatchStream`, so the reference's
  * cron-driven "fetch (watermark, head]" loop becomes a first-class
  * Structured Streaming source:
  *
  * {{{
  * spark.readStream.format("graft-rpc")
  *   .option("endpoint", url).option("startBlock", "0").load()
  * }}}
  *
  * Offsets ARE block heights: each micro-batch covers the height range
  * `(startOffset, endOffset]`, committed offsets live in the query
  * checkpoint, and a restart resumes exactly after the last committed
  * height — the streaming analogue of the batch pipeline's MAX(block)
  * watermark (S10/S11). Replay of an uncommitted batch re-fetches the
  * SAME height range (heights are deterministic keys), so the
  * idempotent sink path downstream makes the pipeline exactly-once.
  *
  * Admission control: `maxBlocksPerTrigger` caps each batch's height
  * span (the backfill-after-downtime guard); `Trigger.AvailableNow`
  * pins the head ONCE and drains up to it in capped batches, then
  * stops — one cron catch-up run, reproduced exactly.
  *
  * Scale shape: identical to the batch `RpcBlockSource` — the height
  * range splits into `numPartitions` input partitions and each task
  * runs one HTTP client with a bounded worker pool (S6), so cluster
  * fan-out is partitions × maxConcurrency, explicit and tunable.
  */
final class RpcTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rpc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StreamingPipeline.txSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RpcTable(new CaseInsensitiveStringMap(properties))
}

final class RpcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-rpc(${options.get("endpoint")})"
  override def schema(): StructType = StreamingPipeline.txSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = StreamingPipeline.txSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new RpcMicroBatchStream(
          endpoint = Option(options.get("endpoint")).getOrElse(
            sys.error("graft-rpc source requires the 'endpoint' option")),
          startBlock = options.getLong("startBlock", 0L),
          maxBlocksPerTrigger =
            Option(options.get("maxBlocksPerTrigger")).map(_.toLong),
          numPartitions = options.getInt("numPartitions", 4),
          maxConcurrency = options.getInt("maxConcurrency", 8),
          maxRetries = options.getInt("maxRetries", 3),
          backoffMs = options.getLong("backoffMs", 50L))
    }
}

/** A block height as a streaming offset ("everything at or below
  * `block` has been ingested"). */
final case class BlockOffset(block: Long) extends Offset {
  override def json(): String = block.toString
}

final class RpcMicroBatchStream(endpoint: String, startBlock: Long,
    maxBlocksPerTrigger: Option[Long], numPartitions: Int,
    maxConcurrency: Int, maxRetries: Int, backoffMs: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // One driver-side client for head probes (S4), reused across triggers.
  private val client = java.net.http.HttpClient.newHttpClient()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def head(): Long = mapper.readTree(RpcBlockSource.rpcCall(
    client, endpoint, "getblockcount", "", maxRetries, backoffMs))
    .get("result").asLong()

  // Trigger.AvailableNow pins the head once; batches drain up to it.
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(head())

  override def initialOffset(): Offset = BlockOffset(startBlock)
  override def deserializeOffset(json: String): Offset =
    BlockOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxBlocksPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  private def maxRowsIn(limit: ReadLimit): Option[Long] = limit match {
    case r: ReadMaxRows      => Some(r.maxRows())
    case _: ReadAllAvailable => None
    case composite =>
      // CompositeReadLimit (AvailableNow wraps the default limit)
      composite.getClass.getMethods.find(_.getName == "getReadLimits")
        .map(_.invoke(composite).asInstanceOf[Array[ReadLimit]]
          .flatMap(maxRowsIn).minOption).getOrElse(None)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[BlockOffset].block
    val target = availableNowCap.getOrElse(head())
    val capped = maxRowsIn(limit).fold(target)(n => math.min(target, from + n))
    BlockOffset(math.max(capped, from))
  }

  override def reportLatestOffset(): Offset =
    BlockOffset(availableNowCap.getOrElse(head()))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[BlockOffset].block
    val hi = end.asInstanceOf[BlockOffset].block
    val n = math.max(1, math.min(numPartitions, hi - lo).toInt)
    // contiguous height slices, sizes differing by at most one
    val span = hi - lo
    (0 until n).map { i =>
      HeightRangePartition(lo + span * i / n, lo + span * (i + 1) / n)
    }.filter(p => p.toInclusive > p.fromExclusive).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RpcPartitionReaderFactory(endpoint, maxConcurrency, maxRetries, backoffMs)

  override def commit(end: Offset): Unit = () // remote source: nothing to ack
  override def stop(): Unit = ()
}

final case class HeightRangePartition(fromExclusive: Long, toInclusive: Long)
    extends InputPartition

final class RpcPartitionReaderFactory(endpoint: String, maxConcurrency: Int,
    maxRetries: Int, backoffMs: Long) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HeightRangePartition]
    new PartitionReader[InternalRow] {
      // the batch fan-out body, verbatim: one client + bounded pool per
      // partition (S6), rows in completion order
      private val rows = RpcBlockSource.fetchPartition(
        ((p.fromExclusive + 1) to p.toInclusive).iterator,
        endpoint, maxConcurrency, maxRetries, backoffMs)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          val t = rows.next()
          def utf8(s: String): UTF8String =
            if (s == null) null else UTF8String.fromString(s)
          current = InternalRow(utf8(t.txid), t.block,
            t.blocktime.map(Long.box).orNull, t.type_int, utf8(t.fee),
            utf8(t.data))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
