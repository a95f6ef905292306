package graft.queries

import graft.{QuerySpec, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multimodal gate queries over REAL image bytes: each document derives a
  * deterministic solid-color PNG (dimensions + color from its md5), the
  * payload is encoded with the real JDK ImageIO codec inside the query,
  * and the decode side reads those bytes back through ImageIO — a genuine
  * encode→binary column→decode round trip whose *painted* arithmetic the
  * oracle can mirror exactly (PNG is lossless). m02 runs the same real
  * codec through the video path: a concatenated-PNG (MJPEG-style)
  * container demuxed by chunk structure, every 2nd frame decoded. */
object MultimodalOps {

  import org.apache.spark.sql.Column

  /** i-th byte (0-based) of md5(text) as an int column. */
  private def md5Byte(i: Int): Column =
    conv(substring(md5(col("text")), 2 * i + 1, 2), 16, 10).cast("int")

  /** Real PNG payload: w,h in 8..23 px, solid RGB — all from md5(text). */
  private val pngUdf = udf { (w: Int, h: Int, r: Int, g: Int, b: Int) =>
    Multimodal.encodePng(w, h, r, g, b)
  }

  /** The image corpus — one solid-color PNG per document, dimensions and
    * color from md5(text) — as a binary-column parquet table written once
    * per (session, dataset). In production the image bytes are STORED
    * data the query scans; encoding them in-query would time corpus
    * *generation*, not the decode pipeline under test (same amortization
    * contract as the stac05 ndjson corpus and the d03 pair cache). The
    * generation pass repartitions before encoding so the CPU-bound codec
    * work uses every core. */
  private val imageTables =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def pngDocsPath(s: SparkSession, dir: String): String =
    imageTables.getOrElseUpdate((s, dir), {
      val out = java.nio.file.Files.createTempDirectory("graft_images").toString + "/images"
      Tables.t(s, dir, "documents")
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          pngUdf(md5Byte(0) % 16 + 8, md5Byte(1) % 16 + 8,
            md5Byte(2), md5Byte(3), md5Byte(4)).as("payload"))
        .write.mode("overwrite").parquet(out)
      out
    })

  private def pngDocs(s: SparkSession, dir: String) =
    s.read.parquet(pngDocsPath(s, dir))

  /** m06 harness prep: a re-encoded variant of every 5th document —
    * dimensions from md5 bytes 5/6 shifted into 24..39, DISJOINT from the
    * base corpus's 8..23 range, so variant bytes are unconditionally
    * different from their source — same painted color, doc_id +
    * 1,000,000: a known-true duplicate population that byte-level dedup
    * cannot see. Only the variants are written; m06 reads this dir
    * TOGETHER with the existing base corpus (no re-copy of the already-
    * materialized images). Written once per (session, dataset). */
  private val dedupVariantTables =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def dedupImageDocs(s: SparkSession, dir: String): Seq[String] =
    Seq(pngDocsPath(s, dir), dedupVariantTables.getOrElseUpdate((s, dir), {
      val out = java.nio.file.Files.createTempDirectory("graft_imgdedup").toString + "/variants"
      Tables.t(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0)
        .repartition(col("doc_id"))
        .select((col("doc_id") + 1000000L).as("doc_id"),
          pngUdf(md5Byte(5) % 16 + 24, md5Byte(6) % 16 + 24,
            md5Byte(2), md5Byte(3), md5Byte(4)).as("payload"))
        .write.mode("overwrite").parquet(out)
      out
    }))

  private val materializeImages: Option[(SparkSession, String) => Unit] =
    Some((s, dir) => { pngDocsPath(s, dir); () })

  /** m02 harness prep: the video corpus — one 5-frame concatenated-PNG
    * container per document, frame parameters from md5(text#frame) — as a
    * binary-column parquet table written once per (session, dataset). In
    * production the video bytes are STORED data the query scans; encoding
    * 5 frames per row in-query would time corpus *generation*, not the
    * demux+decode pipeline under test. Same amortization contract as the
    * stac05 ndjson corpus and the d03 pair cache. */
  private val videoTables =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private[queries] val nVideoFrames = 5

  private def videoDocs(s: SparkSession, dir: String): String =
    videoTables.getOrElseUpdate((s, dir), {
      def fb(j: Int, i: Int) =
        conv(substring(md5(concat(col("text"), lit("#" + j))), 2 * i + 1, 2), 16, 10)
          .cast("int")
      val videoUdf = udf { (params: Seq[Seq[Int]]) =>
        Multimodal.encodeVideo(params.map(p =>
          Multimodal.encodePng(p(0), p(1), p(2), p(3), p(4))))
      }
      val frameParams = array((0 until nVideoFrames).map(j =>
        array(fb(j, 0) % 16 + 8, fb(j, 1) % 16 + 8, fb(j, 2), fb(j, 3), fb(j, 4))): _*)
      val out = java.nio.file.Files.createTempDirectory("graft_videos").toString + "/videos"
      Tables.t(s, dir, "documents")
        .repartition(col("doc_id"))
        .select(col("doc_id"), videoUdf(frameParams).as("payload"))
        .write.mode("overwrite").parquet(out)
      out
    })

  val specs: Seq[QuerySpec] = Seq(

    // Real codec round trip: the decoded dimensions/format must equal the
    // painted ones — width/height via ImageIO.read, format via magic-byte
    // sniffing of genuine PNG bytes.
    QuerySpec(
      "m01_image_metadata",
      Some("""
        SELECT doc_id,
               CAST(('0x'||substr(md5(text),1,2)) AS INTEGER) % 16 + 8 AS width,
               CAST(('0x'||substr(md5(text),3,2)) AS INTEGER) % 16 + 8 AS height,
               'png' AS format
        FROM documents
        ORDER BY doc_id"""),
      (s, dir) =>
        Multimodal.extractImageMeta(pngDocs(s, dir)).toDF()
          .select(col("doc_id"), col("width"), col("height"), col("format"))
          .orderBy(col("doc_id")),
      prepare = materializeImages),

    // REAL video path: each document builds a 5-frame MJPEG-style
    // container (concatenated solid-color PNGs, per-frame dimensions and
    // color from md5(text#frame)), the container is demuxed by walking
    // the actual PNG chunk structure, and every 2nd frame — frames 0, 2,
    // 4; skipped frames are never decoded — goes through the real ImageIO
    // decode. The oracle replays the painted arithmetic per sampled
    // frame: a w×h solid fill decodes to channel sums w·h·c exactly
    // (PNG is lossless), so the hash check proves the demuxer found the
    // true frame boundaries AND the codec recovered every pixel.
    QuerySpec(
      "m02_frame_sampling",
      Some("""
        WITH f AS (SELECT unnest([0, 2, 4]) AS i),
        b AS (SELECT doc_id, i,
                     CAST(('0x'||substr(md5(text||'#'||i),1,2)) AS INTEGER) % 16 + 8 AS w,
                     CAST(('0x'||substr(md5(text||'#'||i),3,2)) AS INTEGER) % 16 + 8 AS h,
                     CAST(('0x'||substr(md5(text||'#'||i),5,2)) AS BIGINT) AS r,
                     CAST(('0x'||substr(md5(text||'#'||i),7,2)) AS BIGINT) AS g,
                     CAST(('0x'||substr(md5(text||'#'||i),9,2)) AS BIGINT) AS bl
              FROM documents, f)
        SELECT doc_id, i AS frame_idx, w AS width, h AS height,
               CAST(w*h*r AS DOUBLE) AS f0,
               CAST(w*h*g AS DOUBLE) AS f1,
               CAST(w*h*bl AS DOUBLE) AS f2
        FROM b
        ORDER BY doc_id, frame_idx"""),
      (s, dir) => {
        // the timed pipeline: scan stored video binaries → demux → decode
        // every 2nd frame (skipped frames never pay the codec)
        val docs = s.read.parquet(videoDocs(s, dir))
        Multimodal.sampleVideoFrames(docs, every = 2, dim = 3).toDF()
          .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
            element_at(col("features"), 1).cast("double").as("f0"),
            element_at(col("features"), 2).cast("double").as("f1"),
            element_at(col("features"), 3).cast("double").as("f2"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      prepare = Some((s, dir) => { videoDocs(s, dir); () })),

    // Real WAV codec round trip: each document derives a 16-bit PCM WAV
    // (rate/channels/frame count from md5 bytes), encoded with the JDK's
    // javax.sound.sampled writer inside the query and parsed back from
    // the actual RIFF header. The oracle replays the written arithmetic:
    // duration_ms = frames*1000 // rate (floor division, both engines).
    QuerySpec(
      "m04_audio_metadata",
      Some("""
        SELECT doc_id,
               CASE WHEN CAST(('0x'||substr(md5(text),11,2)) AS INTEGER) % 2 = 0
                    THEN 44100 ELSE 16000 END AS sample_rate,
               CAST((CAST(('0x'||substr(md5(text),13,2)) AS BIGINT) * 50 + 1000) * 1000
                    // (CASE WHEN CAST(('0x'||substr(md5(text),11,2)) AS INTEGER) % 2 = 0
                        THEN 44100 ELSE 16000 END) AS INTEGER) AS duration_ms,
               CAST(('0x'||substr(md5(text),15,2)) AS INTEGER) % 2 + 1 AS channels
        FROM documents
        ORDER BY doc_id"""),
      (s, dir) => {
        val wavUdf = udf { (rate: Int, ch: Int, frames: Int, seed: Int) =>
          Multimodal.encodeWav(rate, ch, frames, seed)
        }
        val docs = Tables.t(s, dir, "documents")
          .repartition(col("doc_id"))
          .select(col("doc_id"),
            wavUdf(
              when(md5Byte(5) % 2 === 0, 44100).otherwise(16000),
              md5Byte(7) % 2 + 1,
              md5Byte(6) * 50 + 1000,
              md5Byte(8)).as("payload"))
        Multimodal.extractAudioMeta(docs).toDF()
          .select(col("doc_id"), col("sample_rate"), col("duration_ms"), col("channels"))
          .orderBy(col("doc_id"))
      }),

    // Real resize round trip: encode → Graphics2D nearest-neighbor resize
    // to fixed 6×4 → decode. Dimensions come from the real codec; the
    // solid fill survives nearest-neighbor resampling exactly, so the
    // per-image channel sums are closed-form for the oracle: 24 pixels ×
    // the painted color.
    QuerySpec(
      "m05_image_resize",
      Some("""
        SELECT doc_id, 6 AS width, 4 AS height,
               CAST(CAST(('0x'||substr(md5(text),5,2)) AS BIGINT) * 24 AS DOUBLE) AS f0,
               CAST(CAST(('0x'||substr(md5(text),7,2)) AS BIGINT) * 24 AS DOUBLE) AS f1,
               CAST(CAST(('0x'||substr(md5(text),9,2)) AS BIGINT) * 24 AS DOUBLE) AS f2
        FROM documents
        ORDER BY doc_id"""),
      (s, dir) => {
        val resized = Multimodal.resizeImages(pngDocs(s, dir), outW = 6, outH = 4)
          .withColumnRenamed("resized", "payload")
        // dim=3 over the 6×4 RGB sequence: 3 | seq length, so bucket j is
        // exactly channel j summed over the 24 pixels; meta and features
        // come from ONE decode per row
        Multimodal.extractImageMetaAndFeatures(resized, dim = 3).toDF()
          .select(col("doc_id"), col("width"), col("height"),
            element_at(col("features"), 1).cast("double").as("f0"),
            element_at(col("features"), 2).cast("double").as("f1"),
            element_at(col("features"), 3).cast("double").as("f2"))
          .orderBy(col("doc_id"))
      },
      prepare = materializeImages),

    // Feature extraction over DECODED PIXELS: the PNG payload is decoded
    // through ImageIO and the flat RGB sequence [r,g,b,r,g,b,…] folds into
    // 4 float buckets (bucket i sums channel values at positions ≡ i mod
    // 4). The oracle replays the painted arithmetic: a w×h solid-color
    // image contributes c[i%3] at sequence position i. Integer sums →
    // exact doubles, so the hash check proves the real decode recovered
    // every pixel.
    QuerySpec(
      "m03_feature_extract",
      Some("""
        WITH b AS (SELECT doc_id,
                          CAST(('0x'||substr(md5(text),1,2)) AS INTEGER) % 16 + 8 AS w,
                          CAST(('0x'||substr(md5(text),3,2)) AS INTEGER) % 16 + 8 AS h,
                          [CAST(('0x'||substr(md5(text),5,2)) AS BIGINT),
                           CAST(('0x'||substr(md5(text),7,2)) AS BIGINT),
                           CAST(('0x'||substr(md5(text),9,2)) AS BIGINT)] AS c
                   FROM documents)
        SELECT doc_id,
               CAST(list_sum([c[i%3 + 1] for i in generate_series(0, 3*w*h-1) if i%4 = 0]) AS DOUBLE) AS f0,
               CAST(list_sum([c[i%3 + 1] for i in generate_series(0, 3*w*h-1) if i%4 = 1]) AS DOUBLE) AS f1,
               CAST(list_sum([c[i%3 + 1] for i in generate_series(0, 3*w*h-1) if i%4 = 2]) AS DOUBLE) AS f2,
               CAST(list_sum([c[i%3 + 1] for i in generate_series(0, 3*w*h-1) if i%4 = 3]) AS DOUBLE) AS f3
        FROM b
        ORDER BY doc_id"""),
      (s, dir) =>
        Multimodal.extractPixelFeatures(pngDocs(s, dir), dim = 4)
          .select(col("doc_id"),
            element_at(col("features"), 1).cast("double").as("f0"),
            element_at(col("features"), 2).cast("double").as("f1"),
            element_at(col("features"), 3).cast("double").as("f2"),
            element_at(col("features"), 4).cast("double").as("f3"))
          .orderBy(col("doc_id")),
      prepare = materializeImages),

    // ----- image dedup: decode → canonical resize → pixel fingerprint -----
    // The image-side dedup pipeline: every 5th document gets a RE-ENCODED
    // variant at different dimensions but the same painted color
    // (doc_id + 1,000,000 — the dimension change defeats byte-level
    // dedup), and the pipeline must collapse variant with source by
    // CONTENT: real ImageIO decode → real Graphics2D resize to a 4×4
    // canonical thumbnail (nearest-neighbor keeps solid fills exact) →
    // per-channel pixel sums as the fingerprint → hash-agg clusters. The
    // oracle derives each image's color straight from the md5 recipe, so
    // any codec/resize deviation from the painted pixels, a missed
    // variant, or a wrong cluster winner fails the hash. All linear:
    // decode+resize are scan-stage partition iterators, the only shuffle
    // is the fingerprint hash-agg.
    QuerySpec(
      "m06_image_dedup",
      Some("""
        WITH base AS (SELECT doc_id,
                             CAST(('0x'||substr(md5(text),5,2)) AS INTEGER) AS r,
                             CAST(('0x'||substr(md5(text),7,2)) AS INTEGER) AS g,
                             CAST(('0x'||substr(md5(text),9,2)) AS INTEGER) AS b
                      FROM documents),
             c AS (SELECT doc_id, r, g, b FROM base
                   UNION ALL
                   SELECT doc_id + 1000000, r, g, b FROM base WHERE doc_id % 5 = 0)
        SELECT min(doc_id) AS keeper, count(*) AS n_members,
               CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM c GROUP BY r, g, b
        ORDER BY keeper"""),
      (s, dir) => {
        val corpus = s.read.parquet(dedupImageDocs(s, dir): _*)
        val resized = Multimodal.resizeImages(corpus, outW = 4, outH = 4)
          .withColumnRenamed("resized", "payload")
        // 4×4 solid thumbnail → channel sum = 16 × color; /16 is exact
        // (power-of-two scale) so the group key is the recovered color
        Multimodal.extractPixelFeatures(resized, dim = 3)
          .select(col("doc_id"),
            (element_at(col("features"), 1) / 16).cast("int").as("r"),
            (element_at(col("features"), 2) / 16).cast("int").as("g"),
            (element_at(col("features"), 3) / 16).cast("int").as("b"))
          .groupBy(col("r"), col("g"), col("b"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_members"),
            sum(col("doc_id")).as("id_sum"))
          .select(col("keeper"), col("n_members"), col("id_sum"))
          .orderBy(col("keeper"))
      },
      prepare = Some((s, dir) => { dedupImageDocs(s, dir); () })),

    // ----- video scene-cut detection: temporal analytics over frames -----
    // The temporal op on top of m02's demux: ALL frames decode (every=1),
    // each frame's mean RGB is recovered from the real pixel sums
    // (f/(w·h) is exact — solid fills make the mean the painted color),
    // and a per-video lag window scores consecutive-frame L1 color
    // distance; a cut is a jump past the threshold. The oracle replays
    // the painted colors per frame index and the same lag arithmetic —
    // a demux misalignment, a codec pixel error, or a wrong window
    // order fails the hash. Scale: decode is scan-stage; the window
    // partitions by video (5 rows each), shuffling only (id, frame,
    // 3 ints) per frame.
    QuerySpec(
      "m08_scene_cuts",
      Some("""
        WITH f AS (SELECT doc_id, u.j AS frame_idx,
                          CAST(('0x'||substr(md5(text||'#'||u.j),5,2)) AS INTEGER) AS r,
                          CAST(('0x'||substr(md5(text||'#'||u.j),7,2)) AS INTEGER) AS g,
                          CAST(('0x'||substr(md5(text||'#'||u.j),9,2)) AS INTEGER) AS b
                   FROM documents, unnest(generate_series(0, 4)) AS u(j)),
             d AS (SELECT doc_id, frame_idx,
                          abs(r - lag(r) OVER w) + abs(g - lag(g) OVER w)
                            + abs(b - lag(b) OVER w) AS l1
                   FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx))
        SELECT doc_id, frame_idx, l1, l1 > 100 AS is_cut
        FROM d WHERE frame_idx > 0
        ORDER BY doc_id, frame_idx"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = s.read.parquet(videoDocs(s, dir))
        val frames = Multimodal.sampleVideoFrames(docs, every = 1, dim = 3).toDF()
        val px = col("width") * col("height")
        val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
        def mean(i: Int) = (element_at(col("features"), i).cast("double") / px).cast("int")
        val l1 = abs(col("r") - lag(col("r"), 1).over(w)) +
          abs(col("g") - lag(col("g"), 1).over(w)) +
          abs(col("b") - lag(col("b"), 1).over(w))
        frames
          .select(col("doc_id"), col("frame_idx"),
            mean(1).as("r"), mean(2).as("g"), mean(3).as("b"))
          .select(col("doc_id"), col("frame_idx"), l1.as("l1"))
          .filter(col("frame_idx") > 0)
          .select(col("doc_id"), col("frame_idx"), col("l1"), (col("l1") > 100).as("is_cut"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      prepare = Some((s, dir) => { videoDocs(s, dir); () })),

    // ----- audio feature extraction: the FULL PCM payload decodes -----
    // m04 proves the header round trip; this proves every SAMPLE: the
    // 16-bit PCM stream (seeded generator (seed + i·257) mod 2^16 −
    // 2^15) is encoded through the real writer and the query folds the
    // decoded samples to (sum, peak) per document — the audio analogue
    // of m03's pixel-feature extraction, and the dataflow an embedding
    // forward pass would ride. The oracle replays the generator formula
    // over the full sample index range: one wrong byte anywhere in the
    // data chunk fails the hash.
    QuerySpec(
      "m07_audio_features",
      Some("""
        WITH p AS (SELECT doc_id,
                          (CAST(('0x'||substr(md5(text),13,2)) AS INTEGER) * 50 + 1000)
                            * (CAST(('0x'||substr(md5(text),15,2)) AS INTEGER) % 2 + 1) AS n,
                          CAST(('0x'||substr(md5(text),17,2)) AS INTEGER) AS seed
                   FROM documents)
        SELECT doc_id, n AS n_samples,
               CAST(list_sum([(seed + i*257) % 65536 - 32768
                              for i in generate_series(0, n-1)]) AS BIGINT) AS sample_sum,
               CAST(list_max([abs((seed + i*257) % 65536 - 32768)
                              for i in generate_series(0, n-1)]) AS INTEGER) AS peak
        FROM p
        ORDER BY doc_id"""),
      (s, dir) => {
        val wavUdf = udf { (rate: Int, ch: Int, frames: Int, seed: Int) =>
          Multimodal.encodeWav(rate, ch, frames, seed)
        }
        val docs = Tables.t(s, dir, "documents")
          .repartition(col("doc_id"))
          .select(col("doc_id"),
            wavUdf(
              when(md5Byte(5) % 2 === 0, 44100).otherwise(16000),
              md5Byte(7) % 2 + 1,
              md5Byte(6) * 50 + 1000,
              md5Byte(8)).as("payload"))
        Multimodal.extractAudioFeatures(docs).toDF()
          .select(col("doc_id"), col("n_samples"), col("sample_sum"), col("peak"))
          .orderBy(col("doc_id"))
      }),

    // ----- perceptual image NEAR-dup: grid-banded color candidates -----
    // m06 collapses exact content duplicates; real pipelines also prune
    // PERCEPTUALLY close images (re-exports with slight color shifts).
    // Every 7th document gets a variant repainted with each channel
    // shifted +2 (clipped at 255) — bytes differ, content nearly equal.
    // Candidates come from a 3-D GRID join over the decoded thumbnail
    // colors (cell width 8 ≥ 2ε+1, so a ±2 neighbor is within one cell
    // step per axis — provably lossless): one side sits in its own cell,
    // the other emits its 27 neighbor cells; a pair meets in EXACTLY one
    // cell (the cell delta is unique), so no dedup pass is needed. The
    // exact per-channel |Δ| ≤ 2 verify runs on candidates only — never
    // all-pairs (the in-gate assert pins no cartesian in the plan). The
    // oracle brute-forces the same predicate over the painted colors, so
    // a codec drift, a missed boundary-crossing pair, or a phantom
    // candidate fails the hash.
    QuerySpec(
      "m09_image_neardup",
      Some("""
        WITH base AS (SELECT doc_id,
                             CAST(('0x'||substr(md5(text),5,2)) AS INTEGER) AS r,
                             CAST(('0x'||substr(md5(text),7,2)) AS INTEGER) AS g,
                             CAST(('0x'||substr(md5(text),9,2)) AS INTEGER) AS b
                      FROM documents),
             c AS (SELECT doc_id, r, g, b FROM base
                   UNION ALL
                   SELECT doc_id + 2000000, least(r+2, 255), least(g+2, 255), least(b+2, 255)
                   FROM base WHERE doc_id % 7 = 0)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               b.r - a.r AS dr, b.g - a.g AS dg, b.b - a.b AS db
        FROM c a JOIN c b
          ON a.doc_id < b.doc_id
         AND abs(a.r - b.r) <= 2 AND abs(a.g - b.g) <= 2 AND abs(a.b - b.b) <= 2
        ORDER BY doc_a, doc_b"""),
      (s, dir) => {
        val corpus = s.read.parquet(nearDupPerceptualDocs(s, dir): _*)
        val resized = Multimodal.resizeImages(corpus, outW = 4, outH = 4)
          .withColumnRenamed("resized", "payload")
        // persist the decoded colors BEFORE branching: the frame feeds
        // both join sides and sits under the 27× neighbor explode —
        // without the cache, projection collapsing re-runs the codec
        // chain per exploded row (measured 94 s → ~2 s at sf0.1). The
        // cached frame is 4 ints per image; run-once gate keeps it.
        val colors = Multimodal.extractPixelFeatures(resized, dim = 3)
          .select(col("doc_id"),
            (element_at(col("features"), 1) / 16).cast("int").as("r"),
            (element_at(col("features"), 2) / 16).cast("int").as("g"),
            (element_at(col("features"), 3) / 16).cast("int").as("b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def cellOf(c: Column): Column = floor(c / 8).cast("int")
        val a = colors.select(col("doc_id").as("doc_a"),
          col("r").as("ra"), col("g").as("ga"), col("b").as("ba"),
          cellOf(col("r")).as("cr"), cellOf(col("g")).as("cg"), cellOf(col("b")).as("cb"))
        val offsets = array((for (i <- -1 to 1; j <- -1 to 1; k <- -1 to 1)
          yield struct(lit(i).as("oi"), lit(j).as("oj"), lit(k).as("ok"))): _*)
        val b = colors.select(col("doc_id").as("doc_b"),
            col("r").as("rb"), col("g").as("gb"), col("b").as("bb"),
            cellOf(col("r")).as("br_c"), cellOf(col("g")).as("bg_c"), cellOf(col("b")).as("bb_c"))
          .withColumn("o", explode(offsets))
          .select(col("doc_b"), col("rb"), col("gb"), col("bb"),
            (col("br_c") + col("o.oi")).as("cr"),
            (col("bg_c") + col("o.oj")).as("cg"),
            (col("bb_c") + col("o.ok")).as("cb"))
        val out = a.join(b, Seq("cr", "cg", "cb"))
          .filter(col("doc_a") < col("doc_b") &&
            abs(col("ra") - col("rb")) <= 2 &&
            abs(col("ga") - col("gb")) <= 2 &&
            abs(col("ba") - col("bb")) <= 2)
          .select(col("doc_a"), col("doc_b"),
            (col("rb") - col("ra")).as("dr"),
            (col("gb") - col("ga")).as("dg"),
            (col("bb") - col("ba")).as("db"))
          .orderBy(col("doc_a"), col("doc_b"))
        // the grid join must plan as an equi-join on the cell key — a
        // silent fallback to cartesian/BNLJ would be the quadratic shape
        // this operator exists to avoid
        // sparkPlan, not executedPlan: under AQE the latter is an
        // AdaptiveSparkPlan snapshot (the StacOps.scala spatial-join
        // precedent)
        val physical = out.queryExecution.sparkPlan.toString
        require(!physical.contains("CartesianProduct") &&
          !physical.contains("BroadcastNestedLoopJoin"),
          "m09 grid join degraded to a quadratic join")
        out
      },
      prepare = Some((s, dir) => { nearDupPerceptualDocs(s, dir); () }))
  )

  /** m09 harness prep: a repainted variant of every 7th document — same
    * md5-derived dimensions as the source, each color channel shifted +2
    * (clipped at 255), doc_id + 2,000,000: a perceptually-near duplicate
    * population whose BYTES differ everywhere (different pixel values →
    * different compressed stream), so only content-level comparison can
    * find it. Written once per (session, dataset); read together with
    * the base corpus. */
  private val perceptualVariantTables =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), String]

  private def nearDupPerceptualDocs(s: SparkSession, dir: String): Seq[String] =
    Seq(pngDocsPath(s, dir), perceptualVariantTables.getOrElseUpdate((s, dir), {
      val out = java.nio.file.Files.createTempDirectory("graft_imgneardup").toString + "/variants"
      Tables.t(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0)
        .repartition(col("doc_id"))
        .select((col("doc_id") + 2000000L).as("doc_id"),
          pngUdf(md5Byte(0) % 16 + 8, md5Byte(1) % 16 + 8,
            least(md5Byte(2) + 2, lit(255)).cast("int"),
            least(md5Byte(3) + 2, lit(255)).cast("int"),
            least(md5Byte(4) + 2, lit(255)).cast("int")).as("payload"))
        .write.mode("overwrite").parquet(out)
      out
    }))
}
