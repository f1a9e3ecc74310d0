package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("media table: binary payload + typed metadata struct") {
    val m = Multimodal.mediaTable(Tables.load(spark, TestSpark.sfDir, "documents"))
    val schema = m.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val row = m.orderBy("media_id").first()
    assert(Set("image", "audio", "video").contains(
      row.getStruct(row.fieldIndex("meta")).getAs[String]("kind")))
  }

  test("feature extraction: distributed output equals scalar reference") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(20)
    val viaSpark = Multimodal.extractFeatures(
      Multimodal.mediaTable(docs).as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    val local = docs.select("doc_id", "text").collect()
    for (r <- local) {
      val id = r.getLong(0)
      val expected = Multimodal.fakeDecodeFeatures(r.getString(1).getBytes("UTF-8"))
      assert(viaSpark(id).features.sameElements(expected), s"media $id")
      assert(viaSpark(id).byte_len == r.getString(1).getBytes("UTF-8").length)
      assert(math.abs(viaSpark(id).features.sum - 1.0f) < 1e-3, "normalized histogram")
    }
  }

  test("frame offsets stride the payload deterministically") {
    import spark.implicits._
    val df = Seq(("x" * 100)).toDF("payload")
      .select(Multimodal.frameOffsets(col("payload").cast("binary"), 32).as("f"))
    val offs = df.first().getSeq[Int](0)
    assert(offs == Seq(0, 32, 64, 96))
  }
}
