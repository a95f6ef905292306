package graft.queries

import graft.{QuerySpec, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal gate queries: binary payloads (deterministically derived
  * from document text so the oracle can mirror the arithmetic) flowing
  * through the real mapPartitions decode plumbing. */
object MultimodalOps {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "m01_image_metadata",
      Some("""
        SELECT doc_id,
               (CAST(('0x'||substr(md5(text),1,2)) AS INTEGER) % 64) * 16 + 64 AS width,
               (CAST(('0x'||substr(md5(text),3,2)) AS INTEGER) % 64) * 16 + 64 AS height,
               CASE WHEN CAST(('0x'||substr(md5(text),1,2)) AS INTEGER) % 2 = 0
                    THEN 'png' ELSE 'jpeg' END AS format,
               16 AS n_bytes
        FROM documents
        ORDER BY doc_id"""),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
        Multimodal.extractImageMeta(docs).toDF()
          .select(col("doc_id"), col("width"), col("height"), col("format"),
            col("n_bytes").cast("int").as("n_bytes"))
          .orderBy(col("doc_id"))
      }),

    QuerySpec(
      "m02_frame_sampling",
      Some("""
        SELECT doc_id, f.idx AS frame_idx, f.len AS frame_len
        FROM documents,
             (SELECT unnest([{'idx': 0, 'len': 8}, {'idx': 2, 'len': 8},
                             {'idx': 4, 'len': 4}], recursive := true)) f(idx, len)
        ORDER BY doc_id, frame_idx"""),
      (s, dir) => {
        // 36-byte payload (md5 ∥ md5 ∥ md5[0:4]) → 8-byte frames, every 2nd
        val docs = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            unhex(concat(md5(col("text")), md5(col("text")),
              substring(md5(col("text")), 1, 8))).as("payload"))
        Multimodal.sampleFrames(docs, frameBytes = 8, every = 2)
          .orderBy(col("doc_id"), col("frame_idx"))
      }),

    // Feature extraction: payload bytes fold into 4 float buckets (bucket i
    // sums bytes at positions ≡ i mod 4); the oracle mirrors the byte
    // arithmetic from the md5 hex. Integer sums → exact doubles.
    QuerySpec(
      "m03_feature_extract",
      Some("""
        WITH b AS (SELECT doc_id,
                          [CAST(('0x'||substr(md5(text), 2*j+1, 2)) AS BIGINT)
                           for j in generate_series(0, 15)] AS bytes
                   FROM documents)
        SELECT doc_id,
               CAST(bytes[1]+bytes[5]+bytes[9]+bytes[13] AS DOUBLE) AS f0,
               CAST(bytes[2]+bytes[6]+bytes[10]+bytes[14] AS DOUBLE) AS f1,
               CAST(bytes[3]+bytes[7]+bytes[11]+bytes[15] AS DOUBLE) AS f2,
               CAST(bytes[4]+bytes[8]+bytes[12]+bytes[16] AS DOUBLE) AS f3
        FROM b
        ORDER BY doc_id"""),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), unhex(md5(col("text"))).as("payload"))
        Multimodal.extractFeatures(docs, dim = 4)
          .select(col("doc_id"),
            element_at(col("features"), 1).cast("double").as("f0"),
            element_at(col("features"), 2).cast("double").as("f1"),
            element_at(col("features"), 3).cast("double").as("f2"),
            element_at(col("features"), 4).cast("double").as("f3"))
          .orderBy(col("doc_id"))
      })
  )
}
