package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.ops.MiscOps
import graft.sources.Tables

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asof join: each left row gets the latest right row at-or-before") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 50L, "x"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 8L, "r8"), (1L, 15L, "r15"), (2L, 60L, "r60"))
      .toDF("k", "t", "tag")
      .withColumnRenamed("t", "rt")
    val out = AsOfJoin.asOf(left, "k", "t", right, "k", "rt", Seq("tag", "rt"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("tag"))).toMap
    assert(out == Map("e1" -> "r8", "e2" -> "r15"))
    // e0 (t=5, before first right) and x (right only after) are dropped
  }

  test("asof join: inclusive at equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, "exact")).toDF("k", "rt", "tag")
      .select(col("k"), col("rt"), col("tag"))
    val out = AsOfJoin.asOf(left, "k", "t", right, "k", "rt", Seq("tag"))
    assert(out.collect().head.getAs[String]("tag") == "exact")
  }

  test("asof join on real tables matches a scalar reference check") {
    // markers = error events; left = other events of same users
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    val markers = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id").as("m_user"), col("ts").as("m_ts"))
      .agg(max(col("event_id")).as("marker_id"))
    val left = ev.filter(col("event_type") =!= "error").limit(200)
    val joined = AsOfJoin.asOf(left, "user_id", "ts",
      markers, "m_user", "m_ts", Seq("marker_id", "m_ts"))
    val rows = joined.collect()
    assert(rows.nonEmpty)
    // spot-check: the matched marker is really the latest at-or-before
    val mLocal = markers.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    for (r <- rows.take(20)) {
      val u = r.getAs[Long]("user_id"); val t = r.getAs[java.sql.Timestamp]("ts")
      val expect = mLocal.filter(m => m._1 == u && !m._2.after(t))
        .sortBy(m => (m._2.getTime, m._3)).lastOption.map(_._3)
      assert(expect.contains(r.getAs[Long]("marker_id")))
    }
  }

  test("observe: row count collected as a side product of the action") {
    val df = Tables.load(spark, TestSpark.sfDir, "orders")
    val (observed, obs) = MiscOps.withObservedCount(df.filter(col("o_totalprice") > 0))
    val n = observed.count()
    assert(obs.get("n_rows").asInstanceOf[Long] == n)
  }

  test("health probe: up for real table, typed failure for missing") {
    MiscOps.checkSourceUp(spark, s"${TestSpark.sfDir}/orders.parquet")
    val ex = intercept[MiscOps.SourceDown] {
      MiscOps.checkSourceUp(spark, "/nonexistent/nowhere.parquet")
    }
    assert(ex.path.contains("nowhere"))
  }

  test("type names mapping") {
    val m = MiscOps.columnTypeNames(Tables.load(spark, TestSpark.sfDir, "orders"))
    assert(m("o_orderkey") == "bigint")
    assert(m("o_orderdate").startsWith("timestamp")) // parquet NTZ → timestamp_ntz
  }

  test("connection registry is idempotent") {
    val reg = new MiscOps.ConnectionRegistry(spark)
    assert(reg.createIfAbsent("wh1", "jdbc", "WH1_SECRET"))
    assert(!reg.createIfAbsent("wh1", "jdbc", "WH1_SECRET"))
    assert(reg.get("wh1").contains(("jdbc", "WH1_SECRET")))
    assert(reg.get("nope").isEmpty)
  }
}
