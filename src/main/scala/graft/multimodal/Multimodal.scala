package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary columns
  * with typed metadata, processed batch-at-a-time through mapPartitions.
  *
  * The IMAGE, AUDIO, and VIDEO paths are all real, JDK-builtin codecs (no
  * external jar): [[encodePng]]/[[decodeImage]] emit and parse genuine
  * PNG/JPEG bytes via javax.imageio, [[encodeWav]]/[[decodeAudio]] emit
  * and parse genuine RIFF/WAV via javax.sound.sampled, and the video path
  * demuxes a concatenated-image (MJPEG-style) container — PNG chunk walk
  * / JPEG marker scan — and decodes each sampled frame through the same
  * ImageIO path ([[splitVideoFrames]]/[[sampleVideoFrames]]). The gate
  * queries exercise true encode→binary column→decode round trips.
  *
  * Scale notes: binary payloads stay columnar in parquet; codecs run
  * per-row inside a partition iterator (no per-row task overhead, no
  * driver collect); metadata-only queries never touch the bytes thanks to
  * parquet column pruning.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache — per-call temp-file
  // I/O that dominates small-image codec time. Byte-array streams need no
  // cache at all.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata extracted from an "image" payload. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
                             format: String, n_bytes: Int)

  /** Typed metadata extracted from an "audio" payload. */
  final case class AudioMeta(doc_id: Long, sample_rate: Int,
                             duration_ms: Int, channels: Int)

  /** Real PNG encoder (JDK ImageIO): solid-color w×h TYPE_INT_RGB image.
    * Deterministic bytes-in → image-out, runs distributed inside UDFs. */
  def encodePng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real JPEG encoder (JDK ImageIO), same painted input as [[encodePng]].
    * Lossy: decoded pixels approximate the painted color, so JPEG frames
    * are exercised by round-trip tests, while oracle-exact gate arithmetic
    * uses the lossless PNG path. */
  def encodeJpeg(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  /** Magic-byte format sniff (null/short bytes → "unknown"). */
  private def sniffFormat(bytes: Array[Byte]): String =
    if (bytes == null) "unknown"
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else "unknown"

  /** Null-safe single decode. NonFatal, not just IOException: ImageIO.read
    * throws RuntimeExceptions on malformed-but-magic-valid inputs (bogus
    * dimensions, broken ICC profiles) and the corrupt-row contract must
    * hold for those too. */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null) null
    else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }

  /** Flat [r,g,b, r,g,b, …] byte-value sequence of a decoded image. */
  private def rgbSeq(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth; val h = img.getHeight
    val seq = new Array[Int](3 * w * h)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        seq(i) = (p >> 16) & 0xff; seq(i + 1) = (p >> 8) & 0xff; seq(i + 2) = p & 0xff
        i += 3; x += 1
      }
      y += 1
    }
    seq
  }

  /** dim-bucket fold of an RGB sequence (bucket i sums channel values at
    * positions ≡ i mod dim) — the ONE definition of "pixel features",
    * shared by every extractor. */
  private def foldRgb(seq: Array[Int], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < seq.length) { acc(i % dim) += seq(i).toFloat; i += 1 }
    acc
  }

  /** Real image decoder (JDK ImageIO): dimensions from the actual codec,
    * format sniffed from magic bytes. Returns null dimensions (-1) for
    * null payloads or bytes no installed reader understands — corrupt
    * rows surface as a filterable value instead of killing the task. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, String) = {
    val img = readImage(bytes)
    if (img == null) (-1, -1, sniffFormat(bytes))
    else (img.getWidth, img.getHeight, sniffFormat(bytes))
  }

  /** Decoded RGB pixels as a flat [r,g,b, r,g,b, …] byte-value sequence
    * (row-major) — the input surface for pixel-space feature extraction.
    * Null for null/undecodable bytes (same corrupt-row contract as
    * [[decodeImage]]: surface a filterable value, don't kill the task). */
  def decodeRgb(bytes: Array[Byte]): Array[Int] = {
    val img = readImage(bytes)
    if (img == null) null else rgbSeq(img)
  }

  /** Image metadata extraction over a (doc_id, payload) frame:
    * batch-shaped mapPartitions, typed output, REAL ImageIO decode. */
  def extractImageMeta(df: DataFrame, idCol: String = "doc_id",
                       binCol: String = "payload"): Dataset[ImageMeta] = {
    val pruned = df.select(col(idCol).cast("long"), col(binCol))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, f) = decodeImage(bytes)
        ImageMeta(r.getLong(0), w, h, f, if (bytes == null) 0 else bytes.length)
      }
    }(Encoders.product[ImageMeta])
  }

  /** Real WAV encoder: `frames` samples of 16-bit signed PCM at
    * `sampleRate`, `channels`-channel, payload a deterministic sawtooth
    * seeded by `seed`. Writes the canonical 44-byte RIFF/WAVE header
    * directly — byte-identical layout to what `AudioSystem.write`
    * produces (MultimodalSpec round-trips the bytes through the JDK SPI
    * reader to pin that), without `AudioSystem.write`'s per-call provider
    * scan and stream copy, which at one call per ROW dominated the encode
    * stage of the audio gate. */
  def encodeWav(sampleRate: Int, channels: Int, frames: Int, seed: Int): Array[Byte] = {
    val blockAlign = 2 * channels
    val dataLen = frames * blockAlign
    val b = new Array[Byte](44 + dataLen)
    @inline def putTag(p: Int, s: String): Unit = {
      b(p) = s.charAt(0).toByte; b(p + 1) = s.charAt(1).toByte
      b(p + 2) = s.charAt(2).toByte; b(p + 3) = s.charAt(3).toByte
    }
    @inline def putLe32(p: Int, v: Int): Unit = {
      b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
      b(p + 2) = ((v >> 16) & 0xff).toByte; b(p + 3) = ((v >> 24) & 0xff).toByte
    }
    @inline def putLe16(p: Int, v: Int): Unit = {
      b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
    }
    putTag(0, "RIFF"); putLe32(4, 36 + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16) // PCM fmt chunk is 16 bytes
    putLe16(20, 1) // audio format 1 = linear PCM
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * blockAlign) // byte rate
    putLe16(32, blockAlign); putLe16(34, 16) // bits per sample
    putTag(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < dataLen / 2) {
      val v = ((seed + i * 257) % 65536 - 32768).toShort
      b(44 + 2 * i) = (v & 0xff).toByte; b(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    b
  }

  /** Little-endian u16/u32 reads for the RIFF chunk walk. */
  @inline private def leU16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  @inline private def leU32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** Direct RIFF/WAVE header walk: (rate, durMs, channels) or null if the
    * bytes aren't a well-formed WAV. This is the hot decode path —
    * `AudioSystem.getAudioFileFormat` runs an exception-driven provider
    * scan per call (each non-matching SPI reader throws), which at one
    * call per ROW dominates the metadata query; the chunk walk reads the
    * same genuine header fields at pure-arithmetic cost. */
  /** Shared RIFF/WAVE chunk walk — the ONE copy of the hostile-input
    * guards (magic check, size-overrun bail-out, word-aligned pad
    * advance), so the header path (m04) and the sample path (m07) cannot
    * diverge on the corrupt-row contract. Returns (fmtOff, dataOff,
    * dataLen) with -1 for a chunk not found, or null for bytes that
    * aren't a well-formed WAV. Offsets point at each chunk's payload. */
  private def riffLayout(b: Array[Byte]): (Int, Int, Long) = {
    if (b == null || b.length < 44 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    var p = 12
    var fmtOff = -1; var dataOff = -1; var dataLen = -1L
    while (p + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
      val size = leU32(b, p + 4) // unsigned 32-bit, always >= 0 as a Long
      // a size that walks past the buffer (or whose word-aligned skip
      // doesn't advance p) is malformed — bail out rather than spin: the
      // corrupt-row contract says bad bytes DEGRADE, they never hang a task
      if (size > b.length.toLong - p - 8) return null
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ') {
        if (p + 8 + 16 > b.length) return null
        fmtOff = p + 8
      } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' && b(p + 3) == 'a') {
        dataOff = p + 8; dataLen = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      p += 8 + size.toInt + (size.toInt & 1)
    }
    (fmtOff, dataOff, dataLen)
  }

  private def parseRiffWave(b: Array[Byte]): (Int, Int, Int) = {
    val layout = riffLayout(b)
    if (layout == null) return null
    val (fmtOff, _, dataLen) = layout
    if (fmtOff < 0 || dataLen < 0) return null
    val channels = leU16(b, fmtOff + 2)
    val rate = leU32(b, fmtOff + 4).toInt
    val blockAlign = leU16(b, fmtOff + 12)
    if (rate <= 0 || channels <= 0 || blockAlign <= 0) null
    else {
      val frames = dataLen / blockAlign
      ((rate, (frames * 1000L / rate).toInt, channels))
    }
  }

  /** Real audio decoder: sample rate, duration (floor ms), channel count
    * from the actual container header. WAV takes the direct RIFF chunk
    * walk; any other format falls back to the JDK's SPI reader scan
    * (AIFF, AU, …). Returns (-1, -1, -1) for bytes no parser understands. */
  def decodeAudio(bytes: Array[Byte]): (Int, Int, Int) = {
    val wav = parseRiffWave(bytes)
    if (wav != null) return wav
    try {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ff.getFormat
      val rate = fmt.getSampleRate.toInt
      val durMs = (ff.getFrameLength.toLong * 1000L / rate).toInt
      (rate, durMs, fmt.getChannels)
    } catch {
      // NonFatal: header parsers can throw RuntimeExceptions on malformed
      // RIFF chunks, not just the two declared exception types
      case scala.util.control.NonFatal(_) => (-1, -1, -1)
    }
  }

  /** PCM sample statistics over the REAL data chunk: (sample_sum,
    * peak_abs, n_samples) across all channels, 16-bit LE signed PCM.
    * Returns (-1, -1, -1) for bytes that aren't a well-formed WAV — the
    * same corrupt-row contract as [[decodeAudio]]. This is the
    * feature-extraction analogue of [[extractPixelFeatures]]: the full
    * payload decodes at pure-arithmetic cost in the scan stage (swap the
    * fold for an embedding forward pass, the dataflow is unchanged). */
  def decodeAudioSamples(bytes: Array[Byte]): (Long, Int, Int) = {
    val layout = riffLayout(bytes)
    if (layout == null) return (-1L, -1, -1)
    val (fmtOff, dataOff, dataLen) = layout
    // a WAV with a data chunk but no fmt chunk is malformed: bail exactly
    // like decodeAudio does, so m04 and m07 agree on which rows are corrupt
    if (fmtOff < 0 || dataOff < 0) return (-1L, -1, -1)
    val n = (dataLen / 2).toInt
    var sum = 0L; var peak = 0; var i = 0
    while (i < n) {
      val v = (leU16(bytes, dataOff + 2 * i) << 16) >> 16 // sign-extend
      sum += v
      val a = if (v < 0) -v else v // -32768 → 32768, no overflow in Int
      if (a > peak) peak = a
      i += 1
    }
    (sum, peak, n)
  }

  final case class AudioFeatures(doc_id: Long, n_samples: Int,
                                 sample_sum: Long, peak: Int)

  /** Audio feature extraction — decodes the full PCM payload per row. */
  def extractAudioFeatures(df: DataFrame, idCol: String = "doc_id",
                           binCol: String = "payload"): Dataset[AudioFeatures] = {
    val pruned = df.select(col(idCol).cast("long"), col(binCol))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val (sum, peak, n) = decodeAudioSamples(r.getAs[Array[Byte]](1))
        AudioFeatures(r.getLong(0), n, sum, peak)
      }
    }(Encoders.product[AudioFeatures])
  }

  /** Audio metadata extraction — REAL WAV header parse. */
  def extractAudioMeta(df: DataFrame, idCol: String = "doc_id",
                       binCol: String = "payload"): Dataset[AudioMeta] = {
    val pruned = df.select(col(idCol).cast("long"), col(binCol))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (sr, dur, ch) = decodeAudio(bytes)
        AudioMeta(r.getLong(0), sr, dur, ch)
      }
    }(Encoders.product[AudioMeta])
  }

  /** Pixel-space feature extraction with REAL decode: each payload is
    * decoded through ImageIO, and the flat RGB sequence folds into a
    * `dim`-bucket Array[Float] (bucket i sums channel values at positions
    * ≡ i mod dim) — the embedding-extraction dataflow (binary column →
    * decode → vector column ready for the similarity operators). Swap the
    * fold for a model forward pass and the schema/batching is unchanged. */
  def extractPixelFeatures(df: DataFrame, dim: Int,
                           idCol: String = "doc_id", binCol: String = "payload"): DataFrame = {
    val featUdf = udf { (bytes: Array[Byte]) =>
      val seq = decodeRgb(bytes)
      if (seq == null) null // corrupt payload → null features, filterable
      else foldRgb(seq, dim)
    }
    df.select(col(idCol), featUdf(col(binCol)).as("features"))
  }

  /** Real image resize (JDK Graphics2D): decode → draw scaled onto a new
    * RGB canvas → re-encode PNG. Nearest-neighbor interpolation so solid-
    * color images stay exactly solid (closed-form oracle-able); swap the
    * rendering hint for bilinear in a quality-first pipeline. Null for
    * undecodable input (same corrupt-row contract as [[decodeImage]]). */
  def resizeImage(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    val img = readImage(bytes)
    if (img == null) return null
    val out = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(img, 0, 0, outW, outH, null)
    } finally g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", buf)
    buf.toByteArray
  }

  /** Resize a (id, payload) frame of images to `outW`×`outH` PNGs. */
  def resizeImages(df: DataFrame, outW: Int, outH: Int,
                   idCol: String = "doc_id", binCol: String = "payload"): DataFrame = {
    val rz = udf { (bytes: Array[Byte]) => resizeImage(bytes, outW, outH) }
    df.select(col(idCol), rz(col(binCol)).as("resized"))
  }

  /** Metadata + pixel features in ONE decode per row — a consumer needing
    * both must not pay the codec twice (two separate extract calls would
    * re-derive and re-decode the payload on each branch of the join). */
  final case class ImageMetaFeatures(doc_id: Long, width: Int, height: Int,
                                     format: String, features: Array[Float])

  def extractImageMetaAndFeatures(df: DataFrame, dim: Int,
                                  idCol: String = "doc_id",
                                  binCol: String = "payload"): Dataset[ImageMetaFeatures] = {
    val pruned = df.select(col(idCol).cast("long"), col(binCol))
    pruned.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val img = readImage(bytes) // literally one ImageIO.read per row
        if (img == null)
          ImageMetaFeatures(r.getLong(0), -1, -1, sniffFormat(bytes), null)
        else
          ImageMetaFeatures(r.getLong(0), img.getWidth, img.getHeight,
            sniffFormat(bytes), foldRgb(rgbSeq(img), dim))
      }
    }(Encoders.product[ImageMetaFeatures])
  }

  // ---------------------------------------------------------------- video

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Concatenated-image "video" container (MJPEG-style): frames are whole
    * PNG or JPEG byte streams laid back-to-back with no index — exactly
    * how motion-JPEG AVI payloads and many camera ring buffers store
    * frames. Encoding is plain concatenation. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach(out.write)
    out.toByteArray
  }

  /** End offset (exclusive) of the PNG stream starting at `pos`, or -1 if
    * malformed/truncated: walks the real chunk structure — 8-byte
    * signature, then (4-byte big-endian length, 4-byte type, data, CRC)
    * chunks until IEND — rather than pattern-scanning, so pixel data that
    * happens to contain a signature can't split a frame. */
  private def pngEnd(bytes: Array[Byte], pos: Int): Int = {
    var p = pos + 8
    while (p + 8 <= bytes.length) {
      val len = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
        bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
      if (len < 0 || p + 12L + len > bytes.length) return -1
      p += 12 + len
      if (isEnd) return p
    }
    -1
  }

  /** End offset (exclusive) of the JPEG stream starting at `pos`, or -1:
    * a real marker-segment walk, not a byte scan. Length-prefixed header
    * segments (APPn/COM/DQT/DHT/SOF…) are SKIPPED whole — an EXIF APP1
    * carrying an embedded thumbnail (itself a JPEG ending in FFD9) must
    * not split the frame early. Only inside entropy-coded scan data is
    * the FFD9 search sound, because there 0xFF is always stuffed as FF00
    * or is an RSTn marker. */
  private def jpegEnd(bytes: Array[Byte], pos: Int): Int = {
    val n = bytes.length
    var p = pos + 2
    while (p + 1 < n) {
      if ((bytes(p) & 0xff) != 0xff) return -1 // expected a marker
      var m = bytes(p + 1) & 0xff
      while (m == 0xff && p + 2 < n) { p += 1; m = bytes(p + 1) & 0xff } // fill bytes
      m match {
        case 0xd9 => return p + 2 // EOI
        case 0x01 | 0xd8 => p += 2 // standalone, no length
        case rst if rst >= 0xd0 && rst <= 0xd7 => p += 2
        case 0xda => // SOS: skip its header, then entropy-scan to next true marker
          if (p + 3 >= n) return -1
          val segLen = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          if (segLen < 2) return -1
          p += 2 + segLen
          var done = false
          while (!done && p + 1 < n) {
            if ((bytes(p) & 0xff) == 0xff) {
              val nm = bytes(p + 1) & 0xff
              if (nm == 0x00 || (nm >= 0xd0 && nm <= 0xd7)) p += 2 // stuffed / RSTn
              else done = true // real marker (EOI, next SOS, DNL, …) — outer loop handles
            } else p += 1
          }
          if (!done) return -1
        case _ => // length-prefixed segment: skip payload without scanning it
          if (p + 3 >= n) return -1
          val segLen = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
          if (segLen < 2) return -1
          p += 2 + segLen
      }
    }
    -1
  }

  /** Demux a concatenated-image container into its frames. Format is
    * sniffed per frame (PNG chunk walk / JPEG marker scan), so mixed
    * containers work. A malformed or truncated tail yields the frames
    * parsed before it — the corrupt-row contract again: bad bytes degrade,
    * they don't kill the task. */
  def splitVideoFrames(bytes: Array[Byte]): Array[Array[Byte]] = {
    if (bytes == null) return Array.empty
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      val end =
        if (pos + 8 <= bytes.length &&
          java.util.Arrays.equals(bytes, pos, pos + 8, PngSig, 0, 8)) pngEnd(bytes, pos)
        else if (pos + 2 <= bytes.length && (bytes(pos) & 0xff) == 0xff &&
          (bytes(pos + 1) & 0xff) == 0xd8) jpegEnd(bytes, pos)
        else -1
      if (end < 0) ok = false
      else {
        frames += java.util.Arrays.copyOfRange(bytes, pos, end)
        pos = end
      }
    }
    frames.toArray
  }

  /** One decoded, sampled video frame: real per-frame dimensions and
    * `dim`-bucket pixel features (same fold as the image path). Corrupt
    * frames surface as (-1, -1, null). */
  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
                              height: Int, features: Array[Float])

  /** REAL frame sampling over a video binary column: demux the container,
    * keep every `every`-th frame, decode each kept frame through ImageIO,
    * emit per-frame metadata + pixel features. Skipped frames are never
    * decoded — at scale that is the point of sampling (an every=30 pass
    * over an MJPEG corpus pays 1/30th of the codec cost). Runs in a
    * partition iterator: no per-row task overhead, no driver collect. */
  def sampleVideoFrames(df: DataFrame, every: Int, dim: Int = 3,
                        idCol: String = "doc_id",
                        binCol: String = "payload"): Dataset[VideoFrame] = {
    val pruned = df.select(col(idCol).cast("long"), col(binCol))
    pruned.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        splitVideoFrames(r.getAs[Array[Byte]](1)).iterator.zipWithIndex
          .filter(_._2 % every == 0)
          .map { case (frame, idx) =>
            val img = readImage(frame)
            if (img == null) VideoFrame(id, idx, -1, -1, null)
            else VideoFrame(id, idx, img.getWidth, img.getHeight,
              foldRgb(rgbSeq(img), dim))
          }
      }
    }(Encoders.product[VideoFrame])
  }
}
