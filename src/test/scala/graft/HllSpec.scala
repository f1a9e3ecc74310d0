package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.HllSketch

class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("column and scalar bucket/rank forms agree") {
    import spark.implicits._
    val vals = (1 to 500).map(i => s"val$i")
    val got = vals.toDF("v")
      .select(col("v"), HllSketch.bucket(col("v")).as("b"), HllSketch.rank(col("v")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    for (v <- vals)
      assert(got(v) == (HllSketch.bucketOf(v), HllSketch.rankOf(v)), v)
  }

  test("typed Aggregator estimate equals the column-pipeline estimate") {
    import spark.implicits._
    val n = 3000
    val ds = (1 to n).map(i => s"item${i % 1200}").toDF("__hll_in")
    val viaAgg = ds.agg(HllSketch.hllDistinct.as("est")).first().getDouble(0)
    val viaCols = ds
      .select(HllSketch.bucket(col("__hll_in")).as("b"),
        HllSketch.rank(col("__hll_in")).as("r"))
      .groupBy("b").agg(max(col("r")).as("mr"))
      .agg((lit(HllSketch.Alpha * HllSketch.M * HllSketch.M) /
        (sum(expr("1.0 / shiftleft(1L, mr)")) +
          (lit(HllSketch.M) - count(lit(1))))).as("est"))
      .first().getDouble(0)
    assert(viaAgg == viaCols, s"$viaAgg != $viaCols") // exact-arithmetic => equal
  }

  test("estimate is within ~10% of truth at moderate cardinality") {
    import spark.implicits._
    val distinct = 1200
    val est = (1 to 5000).map(i => s"item${i % distinct}").toDF("__hll_in")
      .agg(HllSketch.hllDistinct.as("est")).first().getDouble(0)
    assert(math.abs(est - distinct) / distinct < 0.10, s"est=$est truth=$distinct")
  }

  test("merge is order-independent: partitioned vs single-partition equal") {
    import spark.implicits._
    val data = (1 to 4000).map(i => s"k${i % 700}")
    val p1 = data.toDF("__hll_in").repartition(1)
      .agg(HllSketch.hllDistinct).first().getDouble(0)
    val p16 = data.toDF("__hll_in").repartition(16)
      .agg(HllSketch.hllDistinct).first().getDouble(0)
    assert(p1 == p16)
  }
}
