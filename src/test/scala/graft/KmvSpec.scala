package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.KmvSketch
import graft.llm.KmvSketch._

/** KMV bottom-k sketch: bounded buffer, window-reference equality,
  * shuffle-order invariance, and set-operation estimate accuracy. */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aggregator sketch equals the bottom-k window reference (small k, bound exercised)") {
    import spark.implicits._
    val k = 8
    val df = (1 to 500).map(i => s"v${i % 200}").toDF("v")
      .select(hash60(col("v")).as("h"))
    val viaAgg = df.agg(kmvAgg(col("h"), k).as("sk"))
      .first().getSeq[Long](0).toSeq
    val viaWindow = df.distinct()
      .orderBy("h").limit(k).collect().map(_.getLong(0)).toSeq
    assert(viaAgg == viaWindow)
    assert(viaAgg.length == k, "bound must be exercised")
  }

  test("sketch is shuffle/partitioning invariant") {
    import spark.implicits._
    val data = (1 to 3000).map(i => s"k${i % 900}")
    def sk(parts: Int) = data.toDF("v").repartition(parts)
      .select(hash60(col("v")).as("h"))
      .agg(kmvAgg(col("h")).as("sk")).first().getSeq[Long](0).toSeq
    assert(sk(1) == sk(16))
  }

  test("distinct estimate within ~10% at k=256; exact below k") {
    import spark.implicits._
    val big = (1 to 8000).map(i => s"item${i % 2000}").toDF("v")
      .select(hash60(col("v")).as("h"))
      .agg(kmvAgg(col("h")).as("sk")).select(estimate(col("sk")))
      .first().getDouble(0)
    assert(math.abs(big - 2000) / 2000.0 < 0.10, s"est=$big truth=2000")
    val small = (1 to 100).map(i => s"item${i % 50}").toDF("v")
      .select(hash60(col("v")).as("h"))
      .agg(kmvAgg(col("h")).as("sk")).select(estimate(col("sk")))
      .first().getDouble(0)
    assert(small == 50.0, s"below k must be exact, got $small")
  }

  test("union and intersection estimates track ground truth (the HLL-impossible op)") {
    import spark.implicits._
    // A = 0..1499, B = 1000..2499 -> |A|=|B|=1500, |A∩B|=500, |A∪B|=2500
    val a = (0 until 1500).map(i => s"u$i").toDF("v")
      .select(hash60(col("v")).as("h")).agg(kmvAgg(col("h")).as("sk"))
      .withColumnRenamed("sk", "ska")
    val b = (1000 until 2500).map(i => s"u$i").toDF("v")
      .select(hash60(col("v")).as("h")).agg(kmvAgg(col("h")).as("sk"))
      .withColumnRenamed("sk", "skb")
    val r = a.crossJoin(b).select(
      estimate(unionSketch(col("ska"), col("skb"))).as("u"),
      intersectEstimate(col("ska"), col("skb")).as("i")).first()
    val (u, i) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(u - 2500) / 2500.0 < 0.15, s"union est $u truth 2500")
    assert(math.abs(i - 500) / 500.0 < 0.35, s"intersect est $i truth 500")
  }

  test("merge handles duplicate hashes across partials without double-counting") {
    val agg = new KmvSketch.KmvAggregator(4)
    val x = Array(1L, 3L, 5L, 7L)
    val y = Array(3L, 4L, 7L, 9L)
    assert(agg.merge(x, y).toSeq == Seq(1L, 3L, 4L, 5L))
    assert(agg.merge(Array.emptyLongArray, y).toSeq == y.toSeq)
    assert(agg.merge(x, Array.emptyLongArray).toSeq == x.toSeq)
  }
}
