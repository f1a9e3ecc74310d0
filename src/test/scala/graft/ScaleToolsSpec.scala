package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.api.GraftClient
import graft.catalog.{DefaultRegistry, MetricQueryRequest}
import graft.operators.SkewJoin
import graft.sources.Tables
import graft.functions.GraftFunctions.dsum

class ScaleToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  // ------------------------------------------------------------ client
  test("client lifecycle: query -> rounded text table") {
    val client = new GraftClient(DefaultRegistry.registry)
    val res = client.query(spark, dir,
      MetricQueryRequest(metrics = Seq("revenue"), savedQuery = Some("revenue_by_month")))
    assert(res.rowCount > 0 && res.rowCount <= 10)
    assert(res.columnNames == Seq("o_orderdate__month", "revenue"))
    assert(res.textTable.contains("revenue"))
    // two-decimal rounding applied to double metric values
    val cell = res.textTable.split("\n")(1).split(" \\| ")(1)
    assert(cell.matches("-?\\d+\\.\\d{1,2}"), cell)
  }

  test("client: empty result presents the empty-set message") {
    val client = new GraftClient(DefaultRegistry.registry)
    val res = client.query(spark, dir, MetricQueryRequest(
      metrics = Seq("revenue"), groupBy = Seq("o_orderpriority"),
      where = Some("o_orderpriority = 'NOPE'")))
    assert(res.rowCount == 0 && res.textTable.contains("no results"))
  }

  test("client: csv + sql-dump presentation paths") {
    val client = new GraftClient(DefaultRegistry.registry)
    val base = Files.createTempDirectory("graft-client").toString
    client.queryToCsv(spark, dir,
      MetricQueryRequest(metrics = Seq("revenue"), groupBy = Seq("n_name")),
      s"$base/csv")
    assert(new java.io.File(s"$base/csv").listFiles().exists(_.getName.endsWith(".csv")))
    val written = client.dumpQueries("revenue", s"$base/sql")
    assert(written.size >= 8 && written.forall(new java.io.File(_).exists()))
  }

  // --------------------------------------------------------- bucketing
  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    Tables.load(s2, dir, "lineitem").write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    Tables.load(s2, dir, "orders").write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")
    val joined = s2.table("li_b").join(s2.table("o_b"),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(dsum(col("l_extendedprice"), 2).as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: no Exchange below the join
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"), plan.take(3000))
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"), plan.take(3000))
  }

  // ------------------------------------------------------------- skew
  test("salted join equals plain join result") {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("value"))
    val dim = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(dim, Seq("user_id"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedJoin(ev, dim, "user_id", col("value"), 8)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("catalog introspection lists metrics, dimensions, saved queries") {
    val client = new GraftClient(DefaultRegistry.registry)
    val metrics = client.listMetrics.map(_._1)
    assert(metrics.contains("revenue") && metrics.contains("avg_order_value"))
    val revDims = client.listMetrics.find(_._1 == "revenue").get._3
    assert(revDims.contains("r_name") && !revDims.contains("event_type"),
      "dims follow the join graph")
    val dims = client.listDimensions
    assert(dims.exists { case (n, owner, time) => n == "ts" && owner == "events" && time })
    assert(client.listSavedQueries == Seq("revenue_by_month", "weekly_revenue_vs_events"))
  }

  test("salted sum equals plain sum") {
    val ev = Tables.load(spark, dir, "events")
    val plain = ev.groupBy(col("event_type")).agg(sum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
    val salted = SkewJoin.saltedSum(ev, "event_type", "value", col("event_id"), 8)
      .collect().map(r => r.getString(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(plain == salted)
  }

  // ------------------------------------------------------------ z-order
  test("morton interleave: known bit patterns") {
    import spark.implicits._
    import graft.operators.ZOrderLayout
    val df = Seq((3L, 0L), (0L, 3L), (2L, 1L), (3L, 3L)).toDF("x", "y")
    val got = df.select(
      ZOrderLayout.interleave(Seq(col("x"), col("y")), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit (b*2 + c): x contributes even bits, y odd bits
    // (3,0)=0b0101=5; (0,3)=0b1010=10; (2,1)=0b0110=6; (3,3)=0b1111=15
    assert(got == Seq(5L, 10L, 6L, 15L), got.toString)
  }

  test("z-order clustered write: tight per-file ranges on BOTH dimensions") {
    import graft.operators.ZOrderLayout
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val base = Files.createTempDirectory("graft-zorder").toString

    // baseline: a single-column sort clusters user_id but leaves value
    // files covering nearly the whole domain
    ev.repartitionByRange(8, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$base/bycol")
    // z-order on (user_id, value)
    ZOrderLayout.clusteredWrite(ev, Seq("user_id", "value"), s"$base/z", 8)

    def meanSpans(path: String): (Double, Double) = {
      val q = ZOrderLayout.layoutQuality(
        spark.read.parquet(path), Seq("user_id", "value"))
        .agg(avg(col("user_id__span_frac")), avg(col("value__span_frac")))
        .collect()(0)
      (q.getDouble(0), q.getDouble(1))
    }
    val (su, sv) = meanSpans(s"$base/z")
    val (bu, bv) = meanSpans(s"$base/bycol")
    // single-column sort: user_id tight, value wide open (the value
    // distribution's long tail keeps the observed span ~0.75+)
    assert(bu < 0.3, s"by-col user_id span $bu")
    assert(bv > 0.6, s"by-col value span $bv")
    // z-order: BOTH dimensions substantially tighter than random (1.0)
    assert(su < 0.6, s"z user_id span $su")
    assert(sv < 0.6, s"z value span $sv")
    // and the z layout dominates the single-column layout on the
    // second dimension by a wide margin
    assert(sv < bv * 0.6, s"z value $sv vs by-col value $bv")

    // row fidelity: clustering is a layout change only
    assert(spark.read.parquet(s"$base/z").count() == ev.count())
  }
}
