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
    ),

    // ── Container-header dimension sniffing, validated by construct-then-
    //    parse: each doc gets a synthetic PNG/GIF/JPEG header whose
    //    width/height are functions of doc_id; Spark PARSES the bytes back
    //    with the codegen-native ImageDims expression (PNG IHDR, GIF
    //    screen descriptor, JPEG marker walk) while the oracle computes
    //    the expected dims directly — any parser defect breaks the hash.
    //    Real image files round-trip in TextAndMultimodalSpec via JDK
    //    ImageIO encoders.
    QueryDef(
      "q87_image_dims",
      (s, d) => {
        val w = lit(16L) + pmod(col("doc_id"), lit(1024L))
        val h = lit(16L) + pmod(col("doc_id") * 7, lit(1024L))
        val w8 = lpad(hex(w), 8, "0")
        val h8 = lpad(hex(h), 8, "0")
        val w4 = lpad(hex(w), 4, "0")
        val h4 = lpad(hex(h), 4, "0")
        val w4le = concat(substring(w4, 3, 2), substring(w4, 1, 2))
        val h4le = concat(substring(h4, 3, 2), substring(h4, 1, 2))
        val payloadHex = when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("89504E470D0A1A0A0000000D49484452"), w8, h8, lit("08")))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat(lit("474946383961"), w4le, h4le))
          .otherwise(concat(lit("FFD8FFE000040000FFC0001108"), h4, w4))
        docs(s, d)
          .select(col("doc_id"),
            graft.functions.ImageDimsExpressions.imageDims(unhex(payloadHex)).as("dims"))
          .select(col("doc_id"), col("dims.format").as("format"),
            col("dims.width").as("width"), col("dims.height").as("height"))
      },
      Some("""SELECT doc_id,
          CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format,
          (16 + doc_id % 1024)::INT AS width,
          (16 + (doc_id * 7) % 1024)::INT AS height
        FROM documents""")
    ),

    // ── Audio counterpart of q87: WAV (RIFF/WAVE) header sniffing —
    //    sample rate / channels / bit depth / sample count read by a
    //    chunk walk over the fmt and data headers, no audio codec.
    //    Construct-then-parse: the oracle computes expected values
    //    directly; real JDK AudioSystem-encoded WAVs round-trip in spec.
    QueryDef(
      "q88_audio_meta",
      (s, d) => {
        def le16(v: org.apache.spark.sql.Column) = {
          val h = lpad(hex(v), 4, "0")
          concat(substring(h, 3, 2), substring(h, 1, 2))
        }
        def le32(v: org.apache.spark.sql.Column) = {
          val h = lpad(hex(v), 8, "0")
          concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
        }
        val sr = lit(8000L) + pmod(col("doc_id"), lit(8L)) * 1000L
        val ch = lit(1L) + pmod(col("doc_id"), lit(2L))
        val nSamp = lit(100L) + pmod(col("doc_id"), lit(1000L))
        val dataSize = nSamp * ch * 2L
        val payloadHex = concat(
          lit("52494646"), le32(lit(36L) + dataSize), lit("57415645"),
          lit("666D7420"), lit("10000000"), lit("0100"),
          le16(ch), le32(sr), le32(sr * ch * 2L), le16(ch * 2L), lit("1000"),
          lit("64617461"), le32(dataSize))
        docs(s, d)
          .select(col("doc_id"),
            graft.functions.WavInfoExpressions.wavInfo(unhex(payloadHex)).as("w"))
          .select(col("doc_id"), col("w.sample_rate").as("sample_rate"),
            col("w.channels").as("channels"), col("w.bits").as("bits"),
            col("w.n_samples").as("n_samples"))
      },
      Some("""SELECT doc_id,
          (8000 + (doc_id % 8) * 1000)::INT AS sample_rate,
          (1 + doc_id % 2)::INT AS channels,
          16::INT AS bits,
          (100 + doc_id % 1000)::BIGINT AS n_samples
        FROM documents""")
    ),

    // ── Video leg of the triad: MP4 (ISO-BMFF) box walk — ftyp brand,
    //    mvhd timescale/duration, tkhd 16.16 fixed-point track dims — no
    //    codec. Construct-then-parse like q87/q88: a minimal
    //    ftyp+moov(mvhd,trak(tkhd)) container is synthesized per doc (even
    //    ids version-0 boxes at timescale 600, odd ids version-1 boxes —
    //    64-bit times — at timescale 1000), Spark parses it back with the
    //    codegen Mp4Info expression, the oracle computes expectations
    //    directly, including the integer duration→ms conversion.
    QueryDef(
      "q93_video_meta",
      (s, d) => {
        def be32(v: org.apache.spark.sql.Column) = lpad(hex(v), 8, "0")
        val v1 = pmod(col("doc_id"), lit(2L)) === 1
        val timescale = when(v1, lit(1000L)).otherwise(lit(600L))
        val duration = lit(3000L) + pmod(col("doc_id") * 37L, lit(600000L))
        val width = lit(160L) + pmod(col("doc_id"), lit(8L)) * 80L
        val height = lit(90L) + pmod(col("doc_id"), lit(8L)) * 45L
        val ftyp = concat(lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000000"))
        // mvhd v0: ver/flags + ctime + mtime + timescale + duration(32)
        val mvhd0 = concat(lit("0000001C"), lit("6D766864"), lit("00000000"),
          lit("00000000"), lit("00000000"), be32(timescale), be32(duration))
        // mvhd v1: ver/flags + ctime(64) + mtime(64) + timescale + duration(64)
        val mvhd1 = concat(lit("00000028"), lit("6D766864"), lit("01000000"),
          lit("0000000000000000"), lit("0000000000000000"), be32(timescale),
          lit("00000000"), be32(duration))
        // tkhd v0 payload: ver/flags,ctime,mtime,trackid,res,dur, res(8),
        // layer/alt/vol/res (8), matrix(36) then width/height at 16.16
        val tkhd0 = concat(lit("0000005C"), lit("746B6864"), lit("00000000"),
          lit("00000000"), lit("00000000"), lit("00000001"), lit("00000000"), be32(duration),
          lit("00000000".repeat(2)), lit("00000000".repeat(2)),
          lit("00000000".repeat(9)),
          be32(width * 65536L), be32(height * 65536L))
        // tkhd v1: 64-bit ctime/mtime/duration → payload 12 bytes longer
        // (96 bytes; box 0x68)
        val tkhd1 = concat(lit("00000068"), lit("746B6864"), lit("01000000"),
          lit("0000000000000000"), lit("0000000000000000"), lit("00000001"), lit("00000000"),
          lit("00000000"), be32(duration),
          lit("00000000".repeat(2)), lit("00000000".repeat(2)),
          lit("00000000".repeat(9)),
          be32(width * 65536L), be32(height * 65536L))
        val mvhd = when(v1, mvhd1).otherwise(mvhd0)
        val tkhd = when(v1, tkhd1).otherwise(tkhd0)
        val trakSize = when(v1, lit(8L + 0x68L)).otherwise(lit(8L + 0x5cL))
        val moovSize = lit(8L) + when(v1, lit(0x28L)).otherwise(lit(0x1cL)) + trakSize
        val payloadHex = concat(ftyp,
          be32(moovSize), lit("6D6F6F76"), mvhd,
          be32(trakSize), lit("7472616B"), tkhd)
        docs(s, d)
          .select(col("doc_id"),
            graft.functions.Mp4InfoExpressions.mp4Info(unhex(payloadHex)).as("m"))
          .select(col("doc_id"), col("m.brand").as("brand"),
            col("m.timescale").as("timescale"), col("m.duration_ms").as("duration_ms"),
            col("m.width").as("width"), col("m.height").as("height"))
      },
      Some("""SELECT doc_id, 'isom' AS brand,
          (CASE WHEN doc_id % 2 = 1 THEN 1000 ELSE 600 END)::INT AS timescale,
          ((3000 + (doc_id * 37) % 600000) * 1000
            // (CASE WHEN doc_id % 2 = 1 THEN 1000 ELSE 600 END))::BIGINT AS duration_ms,
          (160 + (doc_id % 8) * 80)::INT AS width,
          (90 + (doc_id % 8) * 45)::INT AS height
        FROM documents""")
    )
  )
}
