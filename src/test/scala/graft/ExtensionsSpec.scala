package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions makes native functions available in a session built with it") {
    import org.apache.spark.sql.SparkSession
    TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate() // new session over the existing SparkContext
      val r = s2.sql(
        "SELECT hex_decode_utf8('6869') AS d, size(minhash_sig('hello world')) AS k")
        .first()
      assert(r.getString(0) == "hi" && r.getInt(1) == 12)
      assert(s2.sql("SELECT hex_decode_utf8('zz') AS bad").first().isNullAt(0))
    } finally {
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }

  test("csv and json round-trip through the source layer") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    df.write.option("header", "true").csv(s"$base/csv")
    df.write.json(s"$base/json")
    val backCsv = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$base/csv")
    val backJson = spark.read.json(s"$base/json")
    assert(backCsv.count() == 2 && backJson.count() == 2)
    assert(backCsv.columns.sorted.toSeq == Seq("id", "name", "v"))
    assert(backJson.select("name").collect().map(_.getString(0)).sorted.toSeq
      == Seq("a", "b"))
  }
}
