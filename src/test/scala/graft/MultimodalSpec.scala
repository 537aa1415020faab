package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

/** REAL-bytes multimodal path: hand-rolled BMP encoder → javax.imageio
  * decode → BT.601 luma → DCT pHash. The stub path is oracle-checked at
  * the driver gate; this spec pins the real codecs.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pngBytes(w: Int, h: Int,
                       px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("synthesizeBmp emits VALID BMPs that javax.imageio decodes to the " +
    "exact pattern pixels (dims, luma sum, per-pixel values)") {
    val ids = Seq(0L, 1L, 7L, 62L, 123L)
    val decoded = Multimodal.decodeImages(
        Multimodal.synthesizeBmp(ids.toDF("doc_id"), "doc_id"),
        "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    ids.foreach { id =>
      val w = Multimodal.patternWidth(id); val h = Multimodal.patternHeight(id)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.patternGray(id, x, y).toLong).sum
      assert(decoded(id) == (("bmp", w, h, want)), s"id=$id")
    }
    // independent JDK decode agrees pixel-for-pixel (row order + padding)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(
        Multimodal.synthesizeBmp(Seq(7L).toDF("doc_id"), "doc_id")
          .select("payload").head().getAs[Array[Byte]](0)))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert((img.getRGB(x, y) & 0xFF) == Multimodal.patternGray(7L, x, y),
        s"pixel ($x,$y)")
  }

  test("decodeImages handles real PNG bytes too (format sniff + BT.601 " +
    "luma over a non-gray image)") {
    val colored = pngBytes(5, 4, (x, y) => 0) // placeholder, replaced below
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 5)
      img.setRGB(x, y, (x * 50 << 16) | (y * 60 << 8) | ((x + y) * 20))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val want = (for (y <- 0 until 4; x <- 0 until 5) yield {
      val r = x * 50; val g = y * 60; val b = (x + y) * 20
      ((299 * r + 587 * g + 114 * b + 500) / 1000).toLong
    }).sum
    val got = Multimodal.decodeImages(
        Seq((1L, png)).toDF("id", "payload"), "id", "payload")
      .head()
    assert(got.getString(1) == "png" && got.getInt(2) == 5 &&
      got.getInt(3) == 4 && got.getLong(4) == want)
    assert(colored.nonEmpty) // silence unused warning
  }

  test("phash64: duplicates identical; brightness shift near; unrelated " +
    "far; partitioning-independent; batch-size-independent") {
    // range [38, 218] — a +12 shift never clips, so it is a TRUE uniform
    // offset: only the DC coefficient moves, AC bits should barely change
    def pat(x: Int, y: Int): Int =
      (math.sin(x * 0.4) * 45 + math.cos(y * 0.3) * 45 + 128).toInt
    val base = pngBytes(64, 48, pat)
    val dup = pngBytes(64, 48, pat)
    val bright = pngBytes(64, 48, (x, y) => pat(x, y) + 12)
    val rng = new scala.util.Random(3)
    val noise = pngBytes(64, 48, (_, _) => rng.nextInt(256))
    val df = Seq((1L, base), (2L, dup), (3L, bright), (4L, noise))
      .toDF("id", "payload")
    val h = Multimodal.phash64(df.repartition(3), "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L), "identical images must hash identically")
    assert(ham(h(1L), h(3L)) <= 4,
      s"brightness shift moved ${ham(h(1L), h(3L))} bits")
    assert(ham(h(1L), h(4L)) >= 16,
      s"unrelated image only ${ham(h(1L), h(4L))} bits away")
    // partitioning and batch size change nothing
    val again = Multimodal.phash64(df.repartition(1), "id", "payload",
      batchSize = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == h)
  }

  test("decodeImages refuses undecodable payloads loudly") {
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "payload")
    val e = intercept[Exception] {
      Multimodal.decodeImages(junk, "id", "payload").collect()
    }
    assert(e.getMessage != null)
  }

  test("synthesizeWav emits VALID WAVs javax.sound decodes back to the " +
    "exact pattern; window features match a sequential reference") {
    val ids = Seq(0L, 1L, 2L, 7L, 41L)
    val df = ids.map(i => Tuple1(i)).toDF("id")
    val rows = Multimodal.decodeAudioWindows(
      Multimodal.synthesizeWav(df.repartition(3), "id"), "id", "payload")
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getInt(1), r.getLong(2), r.getLong(4), r.getInt(5))).toMap
    ids.foreach { id =>
      val n = Multimodal.patternSampleCount(id)
      (0 until n / Multimodal.AudioWindow).foreach { w =>
        val samples = (w * 160 until w * 160 + 160)
          .map(i => Multimodal.patternSample(id, i))
        val want = (Multimodal.AudioRate, n.toLong,
          samples.map(s => s.toLong * s).sum, samples.map(math.abs).max)
        assert(rows((id, w)) == want, s"id=$id window=$w")
      }
      assert(!rows.contains((id, n / Multimodal.AudioWindow)),
        "emitted a window past the clip length")
    }
    // partitioning and batch size change nothing
    val again = Multimodal.decodeAudioWindows(
      Multimodal.synthesizeWav(df.repartition(1), "id"), "id", "payload",
      batchSize = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getInt(1), r.getLong(2), r.getLong(4), r.getInt(5))).toMap
    assert(again == rows)
  }

  test("decodeAudioWindows refuses non-PCM/undecodable payloads loudly") {
    val junk = Seq((1L, Array[Byte](82, 73, 70, 70, 0, 0, 0, 0)))
      .toDF("id", "payload")
    val e = intercept[Exception] {
      Multimodal.decodeAudioWindows(junk, "id", "payload").collect()
    }
    assert(e.getMessage != null)
  }
}
