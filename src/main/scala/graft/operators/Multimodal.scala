package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The decode step itself is a STUB (this environment has no media codecs):
  * [[FakeDecoder]] derives features deterministically from the raw bytes, so
  * every Spark-side contract — schema, batch shape, partitioning, null
  * behavior — is real and testable, and a production codec drops in by
  * replacing one function. Everything else (slicing, metadata, batching) is
  * genuine byte-level work.
  */
object Multimodal {

  /** One media row: id + modality tag + opaque payload + basic metadata. */
  final case class MediaItem(
      mediaId: Long,
      modality: String, // "image" | "audio" | "video" | "text"
      content: Array[Byte],
      nBytes: Long
  )

  /** Decoded features: fixed-dim embedding-like vector per item. */
  final case class MediaFeatures(
      mediaId: Long,
      modality: String,
      nBytes: Long,
      features: Array[Float]
  )

  /** STUB decoder — deterministic bytes→features standing in for a real
    * image/audio codec. Chunk the payload into `dim` ranges and emit each
    * chunk's normalized byte sum: stable, content-sensitive, fast.
    */
  object FakeDecoder {
    def decode(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (content.isEmpty) return out
      val chunk = math.max(1, content.length / dim)
      var i = 0
      while (i < content.length) {
        val b = math.min(i / chunk, dim - 1)
        out(b) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Typed metadata columns computed without decoding: size, digest, magic
    * (first-4-bytes signature — how real pipelines sniff formats).
    */
  def withMetadata(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(contentCol)).cast(LongType))
      .withColumn("digest", md5(col(contentCol)))
      .withColumn("magic", lower(hex(substring(col(contentCol), 1, 4))))

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * window of the byte stream, as an array of binary frames. Pure Column
    * program — frames never leave the executor.
    */
  def sampleFrames(content: Column, frameBytes: Int, stride: Int): Column =
    transform(
      sequence(lit(0L), greatest(floor((length(content) - 1) / (frameBytes * stride)).cast(LongType), lit(0L))),
      i => substring(content, (i * frameBytes * stride + 1).cast(IntegerType), lit(frameBytes))
    )

  /** STUB "resize": deterministic byte-domain downsample to `targetBytes`
    * (every k-th byte) — stands in for an image resize the way
    * [[FakeDecoder]] stands in for decode: the Spark-side shape (binary in,
    * smaller binary out, pure Column-free partition work) is real.
    */
  def fakeResize(content: Array[Byte], targetBytes: Int): Array[Byte] =
    if (content.length <= targetBytes) content
    else {
      val out = new Array[Byte](targetBytes)
      val step = content.length.toDouble / targetBytes
      var i = 0
      while (i < targetBytes) {
        out(i) = content((i * step).toInt)
        i += 1
      }
      out
    }

  /** Batched decode over partitions — the real plumbing a vectorized codec
    * needs: items are processed partition-local in fixed-size batches (the
    * shape a GPU/native decoder consumes), with per-item isolation so one
    * corrupt payload zeroes its own features instead of failing the task.
    */
  def decodeFeatures(items: Dataset[MediaItem], dim: Int, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val feats =
            try FakeDecoder.decode(m.content, dim)
            catch { case _: Throwable => new Array[Float](dim) }
          MediaFeatures(m.mediaId, m.modality, m.nBytes, feats)
        }
      }
    }
  }

  /** REAL image decode using only the JDK (`javax.imageio` ships PNG/JPEG/
    * GIF readers — no external codec dependency): pixels → a `dim`-bin
    * normalized luma histogram, the standard cheap visual feature. Same
    * batched partition-local plumbing and per-item isolation as
    * [[decodeFeatures]]; non-image payloads yield zero features.
    */
  def decodeImageHistogram(items: Dataset[MediaItem], dim: Int = 16, batchSize: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val feats =
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
              if (img == null) new Array[Float](dim)
              else {
                val hist = new Array[Float](dim)
                val (w, h) = (img.getWidth, img.getHeight)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    // integer ITU-R 601 luma approximation
                    val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                    hist(math.min(luma * dim / 256, dim - 1)) += 1f
                    x += 1
                  }
                  y += 1
                }
                val n = (w.toLong * h).toFloat
                var i = 0
                while (i < dim) { hist(i) /= n; i += 1 }
                hist
              }
            } catch { case _: Throwable => new Array[Float](dim) }
          MediaFeatures(m.mediaId, m.modality, m.nBytes, feats)
        }
      }
    }
  }
}
