package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every inventory query runs at sf0.001 and its oracle/queries
  * column contract holds (driver sorts columns by name before hashing,
  * so names must line up — values are checked by the DuckDB gate). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  for (q <- Queries.all) {
    test(s"${q.name} runs and returns a well-formed result") {
      val df = q.run(spark, dir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length,
        s"duplicate output columns in ${q.name}")
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
