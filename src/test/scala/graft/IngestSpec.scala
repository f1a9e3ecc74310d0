package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ingest.IncrementalPipeline
import graft.ingest.IncrementalPipeline.FileBlockSource

/** Reference-shaped fixture A1 (FIXTURES.md): incremental watermark
  * ingestion semantics — delta detection, filter/decode/derive, dedup,
  * idempotent append. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkSource(rows: Seq[(String, Long, java.lang.Long, Int, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-src").toString + "/txs"
    rows.toDF("txid", "block", "blocktime", "type_int", "fee", "data")
      .write.parquet(dir)
    dir
  }

  private def hex(s: String): String =
    s.getBytes("UTF-8").map("%02x".format(_)).mkString

  test("first run ingests only type 200 with data; decode + blockdate derived") {
    val src = mkSource(Seq(
      ("t1", 10L, 1700000000L, 200, "0.1", hex("hello")),
      ("t2", 11L, 1700000060L, 200, "0.2", null),          // dropped: null data
      ("t3", 12L, null, 200, "0.3", hex("wörld")),          // null blocktime ok
      ("t4", 13L, 1700000120L, 100, "0.4", hex("nope")),    // dropped: type
      ("t5", 14L, 1700000180L, 200, "0.5", "zzzz")))        // invalid hex -> null decode
    val sink = Files.createTempDirectory("graft-sink").toString + "/txs"
    val r = IncrementalPipeline.runOnce(spark, new FileBlockSource(spark, src), sink)
    assert(r.lastBlock == 0L && r.currentBlock == 14L && r.appended == 3L)

    val out = spark.read.parquet(sink).orderBy("block").collect()
    assert(out.map(_.getAs[String]("txid")).toSeq == Seq("t1", "t3", "t5"))
    val byId = out.map(x => x.getAs[String]("txid") -> x).toMap
    assert(byId("t1").getAs[String]("decoded_data") == "hello")
    assert(byId("t1").getAs[String]("blockdate") == "2023-11-14T22:13:20")
    assert(byId("t3").getAs[String]("blockdate") == null)
    assert(byId("t3").getAs[String]("decoded_data") == "wörld")
    assert(byId("t5").getAs[String]("decoded_data") == null)
    assert(out.forall(_.getAs[java.sql.Timestamp]("insert_dt") != null))
  }

  test("no-delta run early-exits; re-run never double-inserts") {
    val src = mkSource(Seq(
      ("a1", 5L, 1700000000L, 200, "0.1", hex("x")),
      ("a1", 5L, 1700000000L, 200, "0.1", hex("x")), // in-batch duplicate
      ("a2", 6L, 1700000300L, 200, "0.2", hex("y"))))
    val sink = Files.createTempDirectory("graft-sink2").toString + "/txs"
    val source = new FileBlockSource(spark, src)

    val r1 = IncrementalPipeline.runOnce(spark, source, sink)
    assert(r1.appended == 2L, "in-batch dedup by txid")

    val r2 = IncrementalPipeline.runOnce(spark, source, sink)
    assert(r2.appended == 0L && r2.lastBlock == 6L, "watermark blocks re-ingest")
    assert(spark.read.parquet(sink).count() == 2L)
  }

  test("delta run picks up only blocks above the watermark") {
    val sink = Files.createTempDirectory("graft-sink3").toString + "/txs"
    val src1 = mkSource(Seq(("b1", 1L, 1700000000L, 200, "0", hex("a"))))
    IncrementalPipeline.runOnce(spark, new FileBlockSource(spark, src1), sink)

    // same sink, source advanced: one old block (already seen) + one new
    val src2 = mkSource(Seq(
      ("b1", 1L, 1700000000L, 200, "0", hex("a")),
      ("b2", 2L, 1700000900L, 200, "0", hex("b"))))
    val r = IncrementalPipeline.runOnce(spark, new FileBlockSource(spark, src2), sink)
    assert(r.appended == 1L)
    assert(spark.read.parquet(sink).agg(max(col("block"))).first().getLong(0) == 2L)
  }
}
