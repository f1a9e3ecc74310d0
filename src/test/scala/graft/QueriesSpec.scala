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
      // Gradeability lint (the r13 q190 lesson): the driver's pandas
      // comparator sorts then hashes every cell, and numpy arrays /
      // dicts are unhashable — a top-level Array/Map/Struct column
      // makes the gate err even when the values are right. Project
      // collections to a canonical scalar (join to string, or explode
      // to one row per element) before they leave a gate query.
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      val complexCols = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(complexCols.isEmpty,
        s"${q.name} emits driver-ungradeable complex column(s): " +
          complexCols.mkString(", "))
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
