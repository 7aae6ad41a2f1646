package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column capability surface: `documents.text` re-materialized
  * as an opaque binary payload (the corpus has no real media; bytes are
  * bytes) with typed metadata and frame accounting — the no-decode half of
  * the pipeline, which is exactly the half an engine owns. Decode itself is
  * the stubbed [[graft.operators.Multimodal.FakeDecoder]], exercised in the
  * ScalaTest spec rather than the SQL oracle.
  */
object MultimodalQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "documents")

  val defs: Seq[QueryDef] = Seq(

    // ── Binary payload metadata: size, content digest, magic-bytes
    //    signature, frame count at 16-byte frames / stride 4 — computed
    //    without ever decoding, in one narrow pass.
    QueryDef(
      "q60_multimodal_meta",
      (s, d) => {
        val bin = Multimodal.withMetadata(
          docs(s, d).withColumn("content", encode(col("text"), "UTF-8")),
          "content"
        )
        bin.select(
          col("doc_id"),
          col("n_bytes"),
          col("digest"),
          col("magic"),
          size(Multimodal.sampleFrames(col("content"), frameBytes = 16, stride = 4)).cast(LongType).as("n_frames")
        )
      },
      Some("""SELECT doc_id,
        octet_length(encode(text))::BIGINT AS n_bytes,
        md5(text) AS digest,
        lower(hex(encode(substr(text, 1, 4)))) AS magic,
        ((octet_length(encode(text)) - 1) // 64 + 1)::BIGINT AS n_frames
        FROM documents""")
    )
  )
}
