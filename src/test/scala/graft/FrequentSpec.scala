package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.llm.Frequent

class FrequentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsOf(tokens: Seq[String], parts: Int) = {
    import spark.implicits._
    // one doc per token so the partitioning fully controls how the
    // stream scatters across MG buffers
    tokens.toDF("text").repartition(parts)
  }

  private def trueCounts(tokens: Seq[String]): Map[String, Long] =
    tokens.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

  test("heavyHitters: capacity above the vocabulary is exact counting") {
    val toks = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(9)("gamma") ++ Seq.fill(1)("delta")
    val got = Frequent.heavyHitters(docsOf(toks, 7), "text", capacity = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == trueCounts(toks))
  }

  test("heavyHitters: err_bound is floor(n/(capacity+1)) and rides every row") {
    val toks = Seq.fill(100)("a") ++ Seq.fill(30)("b")
    val rows = Frequent.heavyHitters(docsOf(toks, 3), "text", capacity = 12)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) == 130L / 13L))
  }

  test("heavyHitters under eviction: lower-bound estimates, guaranteed heavy survivors, across partitionings") {
    // skewed stream: one dominant item, a mid item, a tail of 40
    // singletons — capacity 4 forces heavy eviction traffic
    val toks = Seq.fill(300)("hot") ++ Seq.fill(60)("warm") ++
      (0 until 40).map(i => s"tail$i")
    val n = toks.size.toLong
    val cap = 4
    val bound = n / (cap + 1) // 80
    val truth = trueCounts(toks)
    for (parts <- Seq(1, 3, 8)) {
      val got = Frequent
        .heavyHitters(docsOf(new scala.util.Random(42).shuffle(toks), parts),
          "text", capacity = cap)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= cap, s"summary exceeded capacity at parts=$parts")
      // every estimate is a lower bound within n/(cap+1) of the truth
      got.foreach { case (t, est) =>
        val tc = truth(t)
        assert(est <= tc, s"$t overestimated: $est > $tc (parts=$parts)")
        assert(est >= tc - bound,
          s"$t undershot the MG bound: $est < $tc - $bound (parts=$parts)")
      }
      // no false negatives above the bar: count > n/(cap+1) MUST survive
      truth.filter(_._2 > bound).keys.foreach { t =>
        assert(got.contains(t),
          s"guaranteed-heavy '$t' missing at parts=$parts")
      }
    }
  }

  test("heavyHitters: minCount filters the summary, empty tokens dropped") {
    import spark.implicits._
    val df = Seq("x x x y", " ", "x y z").toDF("text")
    val got = Frequent.heavyHitters(df, "text", capacity = 16,
      minCount = 2L).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 4L, "y" -> 2L))
  }
}
