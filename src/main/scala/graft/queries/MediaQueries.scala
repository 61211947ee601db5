package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column operator coverage (builder brief): media payloads as
  * opaque binary columns, metadata extraction, frame sampling, and the
  * decode/featurize pipeline. The DuckDB oracles re-derive the same media
  * table from `documents` (blob = UTF-8 bytes of `text`) and compare on
  * engine-portable encodings (hex strings, octet lengths).
  */
object MediaQueries {

  /** DuckDB twin of [[Multimodal.mediaTable]]. */
  private val mediaSql: String =
    """media AS (
      |  SELECT doc_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    CAST(doc_id % 64 + 16 AS INT) AS declared_w,
      |    CAST(doc_id % 48 + 16 AS INT) AS declared_h,
      |    encode(text) AS blob
      |  FROM documents
      |)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // ---- typed metadata over an opaque binary column ----
    QueryDef.sql(
      "q_media_meta",
      s"""WITH $mediaSql
         |SELECT doc_id, media_type, declared_w, declared_h,
         |  octet_length(blob) AS n_bytes,
         |  md5(text) AS checksum,
         |  octet_length(blob) >= declared_w * declared_h AS payload_complete
         |FROM media JOIN documents USING (doc_id)""".stripMargin
    ) { (s, d) =>
      // checksum computed on the BINARY column (Spark md5 takes binary
      // directly); equals DuckDB's md5 of the source text by construction
      Multimodal.mediaTable(s, d).select(
        col("doc_id"), col("media_type"), col("declared_w"), col("declared_h"),
        octet_length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("checksum"),
        (octet_length(col("blob")) >= col("declared_w") * col("declared_h"))
          .as("payload_complete"))
    },

    // ---- frame sampling: every 64-byte stride, 32-byte frames, cap 8 ----
    QueryDef.sql(
      "q_media_frames",
      s"""WITH $mediaSql, m AS (
         |  SELECT doc_id, media_type, lower(hex(blob)) AS hx,
         |    least(8, greatest(0,
         |      CAST(floor((octet_length(blob) - 32) / 64e0) AS BIGINT) + 1)) AS n_frames
         |  FROM media
         |)
         |SELECT doc_id, media_type, CAST(i AS INT) AS frame_id,
         |  substr(hx, CAST(i * 128 + 1 AS BIGINT), 64) AS frame_hex
         |FROM m, range(0, 8) t(i) WHERE i < n_frames""".stripMargin
    ) { (s, d) => Multimodal.sampleFrames(Multimodal.mediaTable(s, d)) },

    // ---- decode -> resize -> featurize via typed mapPartitions; the
    //      codec is a deterministic stub (no image libs in-container), the
    //      Spark plumbing is real. No SQL oracle (imperative decode):
    //      rows-only check + MultimodalSpec asserts exact values.
    //      The typed Array[Float] thumbnail stays the library surface
    //      (Multimodal.MediaFeatures); the checked output serializes it
    //      (floor(x*1e6) per element, comma-joined) because the driver's
    //      pandas harness cannot sort/hash raw array columns. ----
    QueryDef.rowsOnly("q_media_features") { (s, d) =>
      import s.implicits._
      val media = Multimodal.mediaTable(s, d).as[Multimodal.MediaRecord]
      Multimodal.extractFeatures(media).toDF()
        .withColumn("thumb_q6",
          expr("concat_ws(',', transform(thumb_4x4, " +
            "x -> cast(cast(floor(cast(x as double) * 1e6) as bigint) as string)))"))
        .drop("thumb_4x4")
    }
  )
}
