package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format breadth: CSV and JSON-lines read paths carry the same
  * rows as the parquet tables (round-trip through our own sinks), and
  * corrupt records quarantine instead of failing the read. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("csv round-trip preserves rows and schema contract") {
    val base = Files.createTempDirectory("graft-src-csv").toString
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    orders.write.option("header", "true").csv(s"$base/orders")
    val back = Tables.loadCsv(spark, s"$base/orders",
      org.apache.spark.sql.types.StructType(orders.schema.fields))
      .drop("_corrupt_record")
    assert(back.count() == orders.count())
    assert(back.except(orders).isEmpty && orders.except(back).isEmpty)
  }

  test("jsonl round-trip + sparse keys become nulls, corrupt lines quarantine") {
    val base = Files.createTempDirectory("graft-src-json").toString
    // sparse dicts: second record misses "fee", third line is corrupt
    Files.write(java.nio.file.Paths.get(s"$base/tx.jsonl"),
      java.util.Arrays.asList(
        """{"txid":"a","block":1,"fee":0.5}""",
        """{"txid":"b","block":2}""",
        """{"txid":"c","block":"""),
      java.nio.charset.StandardCharsets.UTF_8)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("txid",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("block",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("fee",
        org.apache.spark.sql.types.DoubleType)))
    // Spark disallows filtering on ONLY the corrupt-record column of a
    // raw file scan — cache the parsed frame first (documented limit)
    val df = Tables.loadJsonl(spark, s"$base/tx.jsonl", schema).cache()
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() == 2)
    assert(good.filter(col("txid") === "b").select("fee").head().isNullAt(0))
  }

  test("orc round-trip preserves rows, schema, and pushdown-friendly layout") {
    val base = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    graft.sinks.Sinks.orc(ev, s"$base/events_orc")
    val back = Tables.loadOrc(spark, s"$base/events_orc")
    assert(back.schema == ev.schema)
    assert(back.count() == ev.count())
    // predicate reaches the ORC scan (footer/stripe pruning surface)
    val plan = back.filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("user_id"),
      plan.take(1500))
  }

  test("jsonl sink round-trips through loadJsonl") {
    val base = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    graft.sinks.Sinks.jsonl(ev, s"$base/ev")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    // cache first: filtering on only the corrupt-record column of a
    // raw file scan is disallowed (same documented limit as above)
    val back = Tables.loadJsonl(spark, s"$base/ev", schema).cache()
      .filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    assert(back.count() == ev.count())
    val a = ev.orderBy("event_id").collect().map(_.toString)
    val b = back.orderBy("event_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
