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
  }

  test("frame sampling explodes one row per sampled frame") {
    val df = Multimodal.sampleFrames(payloads, frameBytes = 4, every = 2)
    // 16 bytes → 4 frames → sampled idx 0 and 2
    val perDoc = df.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.length == 1 && perDoc.head.getLong(0) == 2)
    assert(df.filter(col("frame_len") =!= 4).count() == 0)
  }

  test("feature extraction folds bytes into dim buckets and feeds similarity ops") {
    val feats = Multimodal.extractFeatures(payloads, dim = 4)
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val f = r.getSeq[Float](1)
      assert(f.length == 4 && f.forall(v => v >= 0f && v <= 4 * 255f))
    }
    // the output column type matches the embeddings table (similarity-ready):
    // self-cosine is 1 up to the sqrt·sqrt rounding of the norm product
    import graft.queries.SimilarityOps.{dotd, norm}
    val self = feats.select(
      (dotd(col("features"), col("features")) / (norm(col("features")) * norm(col("features")))).as("c"))
    assert(self.filter(abs(col("c") - 1.0) > 1e-12).count() == 0)
  }

  test("resize stub is deterministic, length-bounded, and binary-in/binary-out") {
    val r1 = Multimodal.resizeStub(payloads, outBytes = 8).collect()
    assert(r1.forall(_.getAs[Array[Byte]]("resized").length == 8))
    val r2 = Multimodal.resizeStub(payloads, outBytes = 8).collect()
    assert(r1.map(_.getAs[Array[Byte]]("resized").toSeq).toSeq ==
      r2.map(_.getAs[Array[Byte]]("resized").toSeq).toSeq)
    // upscale request never exceeds source length
    val big = Multimodal.resizeStub(payloads, outBytes = 64).collect()
    assert(big.forall(_.getAs[Array[Byte]]("resized").length == 16))
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
