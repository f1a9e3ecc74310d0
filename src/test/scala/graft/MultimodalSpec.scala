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

  test("resize: fixed output size, meta rewritten, composes with extract") {
    import spark.implicits._
    val media = Multimodal.mediaTable(
      graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").limit(20))
      .as[Multimodal.MediaRow]
    val resized = Multimodal.resize(media, 8, 4)
    val rows = resized.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.payload.length == 32))
    assert(rows.forall(r => r.meta.width == 8 && r.meta.height == 4))
    // schema-compatible output: feature extraction runs on the resized set
    val feats = Multimodal.extractFeatures(resized).collect()
    assert(feats.forall(_.byte_len == 32L))
    // deterministic: same input → same bytes
    val again = Multimodal.resize(media, 8, 4).collect()
    assert(rows.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }

  test("real image resize: Graphics2D 2x nearest replicates every source pixel") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").limit(25)
    val media = Multimodal.pngImageTable(docs).map(r =>
      Multimodal.MediaRow(r.media_id, r.payload,
        Multimodal.MediaMeta("image", 0, 0, 0)))
    val resized = Multimodal.resizeBy(media, 2, "nearest").collect()
    assert(resized.nonEmpty)
    for (r <- resized) {
      val id = r.media_id
      val (sw, sh) = (8 + (id % 9).toInt, 8 + (id % 7).toInt)
      assert(r.meta.width == sw * 2 && r.meta.height == sh * 2, r.meta.toString)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == sw * 2 && img.getHeight == sh * 2)
      // every output pixel = the source formula at (x/2, y/2): a true
      // decode → Graphics2D scale → PNG encode round-trip, bit-exact
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val expected = ((id * 31 + (x / 2) * 7 + (y / 2) * 13) % 256).toInt
        assert((img.getRGB(x, y) & 0xFF) == expected,
          s"media $id pixel ($x,$y): got ${img.getRGB(x, y) & 0xFF}, want $expected")
      }
    }
  }

  test("real image resize: fixed-target bilinear produces decodable images at the target size") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").limit(10)
    val media = Multimodal.pngImageTable(docs).map(r =>
      Multimodal.MediaRow(r.media_id, r.payload,
        Multimodal.MediaMeta("image", 0, 0, 0)))
    val resized = Multimodal.resize(media, 32, 24, "bilinear").collect()
    for (r <- resized) {
      assert(r.meta.width == 32 && r.meta.height == 24)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == 32 && img.getHeight == 24)
      // grayscale source ⇒ resampled pixels stay gray (R=G=B), and the
      // mean luminance is preserved within interpolation tolerance
      val px = for (y <- 0 until 24; x <- 0 until 32) yield img.getRGB(x, y)
      assert(px.forall(p => ((p >> 16) & 0xFF) == (p & 0xFF) &&
        ((p >> 8) & 0xFF) == (p & 0xFF)))
      val (sw, sh) = (8 + (r.media_id % 9).toInt, 8 + (r.media_id % 7).toInt)
      val srcMean = (for (y <- 0 until sh; x <- 0 until sw)
        yield ((r.media_id * 31 + x * 7 + y * 13) % 256).toDouble).sum / (sw * sh)
      val dstMean = px.map(p => (p & 0xFF).toDouble).sum / px.length
      assert(math.abs(srcMean - dstMean) < 32.0, s"mean drift: $srcMean vs $dstMean")
    }
    // composes: the resized set feeds straight back into feature extraction
    val feats = Multimodal.extractFeatures(
      Multimodal.resize(media, 32, 24, "bilinear")).collect()
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
  }

  test("real PNG decode: ImageIO round-trip recovers the exact pixel formula") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").limit(30)
    val imgs = Multimodal.pngImageTable(docs)
    val rows = imgs.collect()
    // payloads are genuine PNG files (magic bytes), not fakes
    assert(rows.forall(r => Multimodal.looksLikeImage(r.payload)))
    val feats = Multimodal.decodeImageFeatures(imgs).collect()
      .map(f => f.media_id -> f).toMap
    for (r <- rows) {
      val id = r.media_id
      val (w, h) = (8 + (id % 9).toInt, 8 + (id % 7).toInt)
      val expect = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w)
        expect(((id * 31 + x * 7 + y * 13) % 256).toInt / 32) += 1
      val f = feats(id)
      assert(f.width == w && f.height == h)
      assert(f.hist.toSeq == expect.toSeq, s"id=$id")
    }
    // mixed-table routing: PNG payloads take the real path in
    // extractFeatures (features = normalized histogram of PIXELS,
    // not of payload BYTES)
    val media = imgs.map(r => Multimodal.MediaRow(r.media_id, r.payload,
      Multimodal.MediaMeta("image", 0, 0, 0)))
    val viaExtract = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.features).toMap
    for (r <- rows) {
      val f = feats(r.media_id)
      val n = (f.width.toLong * f.height).toFloat
      assert(viaExtract(r.media_id).toSeq == f.hist.map(_ / n).toSeq)
    }
  }

  test("real WAV decode: AudioSystem round-trip recovers the sample formula") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").limit(25)
    val clips = Multimodal.wavAudioTable(docs)
    val rows = clips.collect()
    assert(rows.forall(r => Multimodal.looksLikeWav(r.payload)))
    val feats = Multimodal.decodeAudioFeatures(clips).collect()
      .map(f => f.media_id -> f).toMap
    for (r <- rows) {
      val id = r.media_id
      val n = 400 + (id % 100).toInt
      val expect = new Array[Long](8)
      for (t <- 0 until n)
        expect(((id * 31 + t * 7) % 65536).toInt / 8192) += 1
      val f = feats(id)
      assert(f.sample_rate == 8000 && f.n_frames == n.toLong, s"id=$id")
      assert(f.hist.toSeq == expect.toSeq, s"id=$id")
    }
  }

  test("real AVI demux: RIFF round-trip recovers headers and the pixel formula") {
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").limit(25)
    val vids = Multimodal.aviVideoTable(docs)
    val rows = vids.collect()
    assert(rows.forall(r => Multimodal.looksLikeAvi(r.payload)))
    val feats = Multimodal.decodeVideoFeatures(vids).collect()
      .map(f => f.media_id -> f).toMap
    for (r <- rows) {
      val id = r.media_id
      val (w, h, nf) = (8 + (id % 5).toInt, 6 + (id % 3).toInt, 2 + (id % 4).toInt)
      val expect = new Array[Long](8)
      for (f <- 0 until nf; x <- 0 until w; y <- 0 until h)
        expect(((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt / 32) += 1
      val v = feats(id)
      assert(v.width == w && v.height == h && v.n_frames == nf && v.fps == 10,
        s"id=$id got ${(v.width, v.height, v.n_frames, v.fps)}")
      assert(v.hist.toSeq == expect.toSeq, s"id=$id")
    }
    // odd widths exercise the 4-byte row padding (stride != w*3)
    assert(rows.exists(r => (8 + (r.media_id % 5)) % 4 != 0))
  }

  test("mixed-media routing sniffs AVI payloads to the real demuxer") {
    val id = 7L
    val (w, h, nf) = (8 + (id % 5).toInt, 6 + (id % 3).toInt, 2 + (id % 4).toInt)
    val frames = (0 until nf).map { f =>
      Array.tabulate(w * h)(i =>
        ((id * 31 + f * 17 + (i % w) * 7 + (i / w) * 13) % 256).toByte)
    }
    val avi = Multimodal.writeAviGray(frames, w, h, 10)
    assert(Multimodal.looksLikeAvi(avi) && !Multimodal.looksLikeImage(avi)
      && !Multimodal.looksLikeWav(avi))
    val viaRouter = Multimodal.videoFeatures(avi)
    assert(math.abs(viaRouter.sum - 1.0f) < 1e-5f) // normalized over all pixels
  }

  test("frame offsets stride the payload deterministically") {
    import spark.implicits._
    val df = Seq(("x" * 100)).toDF("payload")
      .select(Multimodal.frameOffsets(col("payload").cast("binary"), 32).as("f"))
    val offs = df.first().getSeq[Int](0)
    assert(offs == Seq(0, 32, 64, 96))
  }
}
