package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-at-a-time through mapPartitions.
  *
  * The decode step is a STUB — the real image/audio libraries are not in
  * this container — but it is a *deterministic* function of the bytes, so
  * the Spark-side plumbing (schema, partitioning, batch shape, typed
  * Dataset boundary) is real and verified end-to-end. Swap
  * [[decodeImageStub]]/[[decodeAudioStub]] for a JNI/library call and
  * nothing else changes.
  *
  * Scale notes: binary payloads stay columnar in parquet; the decoder runs
  * once per row inside a partition iterator (no per-row task overhead, no
  * driver collect); metadata-only queries never touch the bytes thanks to
  * parquet column pruning.
  */
object Multimodal {

  /** Typed metadata extracted from an "image" payload. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
                             format: String, n_bytes: Int)

  /** Typed metadata extracted from an "audio" payload. */
  final case class AudioMeta(doc_id: Long, sample_rate: Int,
                             duration_ms: Int, channels: Int)

  /** STUB image decoder: deterministic pseudo-metadata from the first
    * bytes (replace with a real codec; the dataflow is what matters). */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, String) = {
    val b0 = bytes(0) & 0xff; val b1 = bytes(1) & 0xff
    val width = (b0 % 64) * 16 + 64
    val height = (b1 % 64) * 16 + 64
    val format = if (b0 % 2 == 0) "png" else "jpeg"
    (width, height, format)
  }

  /** STUB audio decoder. */
  def decodeAudioStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val b2 = bytes(2) & 0xff; val b3 = bytes(3) & 0xff
    (if (b2 % 2 == 0) 44100 else 16000, b3 * 250 + 1000, b2 % 2 + 1)
  }

  /** Image metadata extraction over a (doc_id, payload) frame:
    * batch-shaped mapPartitions, typed output. */
  def extractImageMeta(df: DataFrame, idCol: String = "doc_id",
                       binCol: String = "payload"): Dataset[ImageMeta] = {
    val pruned = df.select(col(idCol).cast("long"), col(binCol))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, f) = decodeImageStub(bytes)
        ImageMeta(r.getLong(0), w, h, f, bytes.length)
      }
    }(Encoders.product[ImageMeta])
  }

  /** Audio metadata extraction. */
  def extractAudioMeta(df: DataFrame, idCol: String = "doc_id",
                       binCol: String = "payload"): Dataset[AudioMeta] = {
    val pruned = df.select(col(idCol).cast("long"), col(binCol))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (sr, dur, ch) = decodeAudioStub(bytes)
        AudioMeta(r.getLong(0), sr, dur, ch)
      }
    }(Encoders.product[AudioMeta])
  }

  /** Feature extraction: fold the payload bytes into a `dim`-bucket
    * Array[Float] (bucket i sums bytes at positions ≡ i mod dim) — the
    * embedding-extraction dataflow (binary column → vector column ready
    * for the similarity operators). STUB arithmetic, real plumbing: swap
    * the fold for a model forward pass and the schema/batching is
    * unchanged. */
  def extractFeatures(df: DataFrame, dim: Int,
                      idCol: String = "doc_id", binCol: String = "payload"): DataFrame = {
    val featUdf = udf { (bytes: Array[Byte]) =>
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xff).toFloat; i += 1 }
      acc
    }
    df.select(col(idCol), featUdf(col(binCol)).as("features"))
  }

  /** "Resize" stub: stride-sample the payload down to `outBytes` bytes
    * (deterministic; stands in for a real image resample — the plumbing is
    * binary-in/binary-out at full column pruning). */
  def resizeStub(df: DataFrame, outBytes: Int,
                 idCol: String = "doc_id", binCol: String = "payload"): DataFrame = {
    val rz = udf { (bytes: Array[Byte]) =>
      if (bytes.isEmpty) bytes
      else Array.tabulate(math.min(outBytes, bytes.length))(i =>
        bytes((i.toLong * bytes.length / math.min(outBytes, bytes.length)).toInt))
    }
    df.select(col(idCol), rz(col(binCol)).as("resized"))
  }

  /** "Frame sampling" stub: cut a binary payload into fixed-size frame
    * slices and explode one row per sampled frame — the video-pipeline
    * shape (decode → sample every Nth frame → per-frame features). */
  def sampleFrames(df: DataFrame, frameBytes: Int, every: Int,
                   idCol: String = "doc_id", binCol: String = "payload"): DataFrame = {
    val slices = udf { (bytes: Array[Byte]) =>
      bytes.grouped(frameBytes).zipWithIndex
        .filter(_._2 % every == 0)
        .map { case (frame, idx) => (idx, frame.length) }.toSeq
    }
    df.select(col(idCol), explode(slices(col(binCol))).as("frame"))
      .select(col(idCol), col("frame._1").as("frame_idx"), col("frame._2").as("frame_len"))
  }
}
