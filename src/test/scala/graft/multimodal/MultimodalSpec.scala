package graft.multimodal

import graft.stac.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def payloads = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))

  test("image metadata extraction decodes real PNG bytes via ImageIO") {
    val png = udf((id: Long) => Multimodal.encodePng(
      (id % 13).toInt + 5, (id % 7).toInt + 3, id.toInt & 0xff, 10, 20))
    val imgs = spark.range(0, 50).select(col("id").as("doc_id"), png(col("id")).as("payload"))
    val rows = Multimodal.extractImageMeta(imgs).collect().sortBy(_.doc_id)
    assert(rows.length == 50)
    rows.foreach { m =>
      assert(m.width == (m.doc_id % 13).toInt + 5)
      assert(m.height == (m.doc_id % 7).toInt + 3)
      assert(m.format == "png")
      assert(m.n_bytes > 8) // real encoded payload, not a fixed stub
    }
    // decoding twice gives identical results (pure function of bytes)
    val again = Multimodal.extractImageMeta(imgs).collect().sortBy(_.doc_id)
    assert(rows.sameElements(again))
  }

  test("real JPEG bytes are sniffed and decoded; corrupt bytes surface as -1") {
    val img = new java.awt.image.BufferedImage(9, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    assert(Multimodal.decodeImage(out.toByteArray) == ((9, 4, "jpeg")))
    assert(Multimodal.decodeImage(Array.fill[Byte](16)(42)) == ((-1, -1, "unknown")))
  }

  test("pixel feature extraction recovers painted channel sums through the codec") {
    val png = udf((id: Long) => Multimodal.encodePng(4, 3, 100, 50, 25))
    val imgs = spark.range(0, 5).select(col("id").as("doc_id"), png(col("id")).as("payload"))
    val rows = Multimodal.extractPixelFeatures(imgs, dim = 3).collect()
    // dim == channel count and 3|seq: bucket j is exactly channel j summed
    // over the 12 pixels
    rows.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f == Seq(100f * 12, 50f * 12, 25f * 12))
    }
  }

  test("real resize round-trips dimensions and preserves solid color exactly") {
    val png = udf((id: Long) => Multimodal.encodePng(16, 10, 200, 100, 50))
    val imgs = spark.range(0, 5).select(col("id").as("doc_id"), png(col("id")).as("payload"))
    val resized = Multimodal.resizeImages(imgs, outW = 8, outH = 5)
      .withColumnRenamed("resized", "payload")
    val meta = Multimodal.extractImageMeta(resized).collect()
    meta.foreach { m => assert(m.width == 8 && m.height == 5 && m.format == "png") }
    // nearest-neighbor on a solid image: every output pixel keeps the color
    val feats = Multimodal.extractPixelFeatures(resized, dim = 3).collect()
    feats.foreach { r =>
      assert(r.getSeq[Float](1) == Seq(200f * 40, 100f * 40, 50f * 40))
    }
    // corrupt input → null resized payload, not an exception
    assert(Multimodal.resizeImage(Array.fill[Byte](8)(1), 4, 4) == null)
  }

  test("corrupt payloads yield null features and do not kill the task") {
    val mixed = udf((id: Long) =>
      if (id == 2L) Array.fill[Byte](16)(33) // not an image
      else Multimodal.encodePng(3, 3, 1, 2, 3))
    val imgs = spark.range(0, 4).select(col("id").as("doc_id"), mixed(col("id")).as("payload"))
    val rows = Multimodal.extractPixelFeatures(imgs, dim = 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(2L).isEmpty)                    // corrupt row → null, query survived
    assert(rows.filterKeys(_ != 2L).forall(_._2.nonEmpty))
  }

  test("audio metadata extraction parses real WAV headers") {
    val wav = udf((id: Long) => Multimodal.encodeWav(
      if (id % 2 == 0) 44100 else 16000, (id % 2).toInt + 1, 2000 + id.toInt, id.toInt))
    val audio = spark.range(0, 20).select(col("id").as("doc_id"), wav(col("id")).as("payload"))
    val rows = Multimodal.extractAudioMeta(audio).collect().sortBy(_.doc_id)
    assert(rows.length == 20)
    rows.foreach { a =>
      val rate = if (a.doc_id % 2 == 0) 44100 else 16000
      assert(a.sample_rate == rate)
      assert(a.channels == (a.doc_id % 2).toInt + 1)
      assert(a.duration_ms == (2000 + a.doc_id.toInt) * 1000L / rate)
    }
    // corrupt bytes surface as -1, not an exception
    assert(Multimodal.decodeAudio(Array.fill[Byte](32)(7)) == ((-1, -1, -1)))
    // the directly-written RIFF header is genuine WAV: the JDK's own SPI
    // reader parses the same rate/channels/frames out of our bytes
    val bytes = Multimodal.encodeWav(22050, 2, 777, 5)
    val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(ff.getFormat.getSampleRate.toInt == 22050)
    assert(ff.getFormat.getChannels == 2)
    assert(ff.getFrameLength == 777)
  }

  test("video demux + frame sampling decodes real PNG frames at true boundaries") {
    // 4 frames per doc, each with its own dims and color
    val video = udf { (id: Long) =>
      Multimodal.encodeVideo((0 until 4).map(j =>
        Multimodal.encodePng(5 + j, 3 + j, 10 * j + 1, 20 * j + 2, 30 * j + 3)))
    }
    val vids = spark.range(0, 20).select(col("id").as("doc_id"), video(col("id")).as("payload"))
    val rows = Multimodal.sampleVideoFrames(vids, every = 2, dim = 3).collect()
    // every 2nd of 4 frames → idx 0 and 2 per doc
    assert(rows.length == 40)
    assert(rows.map(_.frame_idx).toSet == Set(0, 2))
    rows.foreach { f =>
      val j = f.frame_idx
      assert(f.width == 5 + j && f.height == 3 + j)
      val px = (5 + j) * (3 + j)
      // lossless PNG: channel sums equal the painted arithmetic exactly
      assert(f.features.toSeq == Seq((10 * j + 1f) * px, (20 * j + 2f) * px, (30 * j + 3f) * px))
    }
  }

  test("video demux handles real JPEG frames via EOI marker scan") {
    val frames = (0 until 3).map(j => Multimodal.encodeJpeg(8 + j, 6, 200, 100, 50))
    val container = Multimodal.encodeVideo(frames)
    val split = Multimodal.splitVideoFrames(container)
    assert(split.length == 3)
    assert(split.map(_.toSeq).toSeq == frames.map(_.toSeq)) // exact byte boundaries
    // each demuxed frame decodes with the right dimensions (dims are exact
    // even though JPEG pixel values are lossy)
    split.zipWithIndex.foreach { case (fb, j) =>
      val (w, h, fmt) = Multimodal.decodeImage(fb)
      assert(w == 8 + j && h == 6 && fmt == "jpeg")
    }
  }

  test("property: random mixed-format containers demux to the exact input frames") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val frameGen: Gen[Array[Byte]] = for {
      w <- Gen.choose(1, 12); h <- Gen.choose(1, 9)
      r <- Gen.choose(0, 255); g <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
      jpeg <- Gen.oneOf(true, false)
    } yield if (jpeg) Multimodal.encodeJpeg(w, h, r, g, b)
            else Multimodal.encodePng(w, h, r, g, b)
    val prop = Prop.forAll(Gen.listOfN(4, frameGen).flatMap(l =>
      Gen.choose(0, 4).map(n => l.take(n)))) { frames =>
      val split = Multimodal.splitVideoFrames(Multimodal.encodeVideo(frames))
      split.length == frames.length &&
        split.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  test("hostile RIFF size field returns corrupt-row values instead of hanging") {
    // 'RIFF' + len + 'WAVE' + chunk 'JUNK' with size 0xFFFFFFF8: the
    // unsigned size truncates to a negative int, which before the bounds
    // guard left the chunk walk spinning in place forever
    val b = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(b, 0)
    "WAVE".getBytes.copyToArray(b, 8)
    "JUNK".getBytes.copyToArray(b, 12)
    b(16) = 0xf8.toByte; b(17) = 0xff.toByte; b(18) = 0xff.toByte; b(19) = 0xff.toByte
    assert(Multimodal.decodeAudio(b) == ((-1, -1, -1)))
    // zero-size chunks advance past themselves too (8-byte header)
    val z = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(z, 0); "WAVE".getBytes.copyToArray(z, 8)
    "JUNK".getBytes.copyToArray(z, 12)
    assert(Multimodal.decodeAudio(z) == ((-1, -1, -1)))
  }

  test("JPEG demux skips an FFD9 inside an APP1 header segment (EXIF thumbnail)") {
    val plain = Multimodal.encodeJpeg(7, 5, 10, 20, 30)
    // splice an APP1 segment right after SOI whose payload contains FFD9
    // (an embedded thumbnail's EOI) — a byte scan would cut the frame here
    val payload = Array[Byte](0x45, 0x78, 0x69, 0x66, 0x00, 0x00,
      0xff.toByte, 0xd8.toByte, 0x01, 0x02, 0xff.toByte, 0xd9.toByte, 0x03)
    val segLen = payload.length + 2
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++ payload
    val withExif = plain.take(2) ++ app1 ++ plain.drop(2)
    val frames = Multimodal.splitVideoFrames(
      Multimodal.encodeVideo(Seq(withExif, plain)))
    assert(frames.length == 2)
    assert(frames(0).length == withExif.length) // not cut at the embedded FFD9
    assert(Multimodal.decodeImage(frames(0))._1 == 7) // still decodable
    assert(frames(1).length == plain.length)
  }

  test("mixed/corrupt containers degrade to the parsed prefix, never throw") {
    val png = Multimodal.encodePng(4, 4, 1, 2, 3)
    val jpg = Multimodal.encodeJpeg(5, 5, 9, 9, 9)
    val garbage = Array.fill[Byte](24)(77)
    // mixed formats demux fine; a malformed tail yields the good prefix
    assert(Multimodal.splitVideoFrames(png ++ jpg).length == 2)
    assert(Multimodal.splitVideoFrames(png ++ jpg ++ garbage).length == 2)
    assert(Multimodal.splitVideoFrames(garbage).isEmpty)
    assert(Multimodal.splitVideoFrames(null).isEmpty)
    // truncated final frame: the complete frames still come back
    val truncated = png ++ jpg.dropRight(10)
    assert(Multimodal.splitVideoFrames(truncated).length == 1)
  }

  test("PCM sample decode recovers the exact generated stream") {
    // 3 frames × 2 channels from seed 5: samples (5 + i·257) mod 2^16 − 2^15
    val wav = Multimodal.encodeWav(16000, 2, 3, 5)
    val expected = (0 until 6).map(i => (5 + i * 257) % 65536 - 32768)
    val (sum, peak, n) = Multimodal.decodeAudioSamples(wav)
    assert(n == 6)
    assert(sum == expected.map(_.toLong).sum)
    assert(peak == expected.map(math.abs).max)
    // corrupt-row contract: garbage and null degrade, never throw
    assert(Multimodal.decodeAudioSamples(Array[Byte](1, 2, 3)) == ((-1L, -1, -1)))
    assert(Multimodal.decodeAudioSamples(null) == ((-1L, -1, -1)))
    // hostile data-chunk size: bail out, don't overrun or spin
    val bad = wav.clone()
    bad(40) = -1; bad(41) = -1; bad(42) = -1; bad(43) = 0x7f
    assert(Multimodal.decodeAudioSamples(bad) == ((-1L, -1, -1)))
  }

  test("metadata-only query prunes the payload column from the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("mm").toString
    payloads.withColumn("n", length(col("payload")))
      .write.mode("overwrite").parquet(tmp)
    val plan = spark.read.parquet(tmp).select("doc_id", "n")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("payload"),
      s"payload should be pruned:\n$plan")
  }
}
