package graft

import graft.functions.TextFunctions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaItem
import org.apache.spark.sql.functions._

class TextAndMultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("shingles: k-grams in order, short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(col("text"), tokens(col("text")).as("toks"))
      .select(shingles(col("toks"), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("rolling hash is deterministic and order-sensitive") {
    val df = Seq("abc", "abc", "acb").toDF("text").select(rollingHash(col("text")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) === hs(1))
    assert(hs(0) !== hs(2))
    // closed form: ((0*31+97)*31+98)*31+99 for "abc"
    assert(hs(0) === ((97L * 31 + 98) * 31 + 99) % HashPrime)
  }

  test("winnowing keeps window minima and survives local edits mostly") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val edited = base.replace("w16", "zz")
    val df = Seq(base, edited).toDF("text")
      .select(tokens(col("text")).as("toks"))
      .select(shingleHashes(shingles(col("toks"), 4)).as("gh"))
      .select(winnowMins(col("gh"), 5).as("fps"))
    val Array(a, b) = df.as[Seq[Long]].collect()
    assert(a.nonEmpty && b.nonEmpty)
    assert(a.toSet.intersect(b.toSet).nonEmpty) // early fingerprints shared
  }

  test("sketch estimates stay within tolerance of exact distinct counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val est = SparkEntry.queries("q36_sketches")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .groupBy("source").agg(countDistinct("term").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (src, d) =>
      assert(math.abs(est(src) - d) <= math.max(2L, (d * 0.1).toLong), s"$src: est=${est(src)} exact=$d")
    }
  }

  test("null and empty text degrade to empty outputs, not failures") {
    import graft.operators.Dedup
    val df = Seq((1L, "a b c d e f"), (2L, null), (3L, "")).toDF("doc_id", "text")
    assert(Dedup.shingleSets(df, "doc_id", "text", 3).count() === 1)
    assert(Dedup.simhashDedup(df, "doc_id", "text", 8).count() === 0)
  }

  test("multimodal: metadata + frame sampling without decoding") {
    val df = Seq((1L, "x" * 100)).toDF("id", "text")
      .withColumn("content", encode(col("text"), "UTF-8"))
    val meta = Multimodal.withMetadata(df, "content")
    val row = meta.select("n_bytes", "digest", "magic").head()
    assert(row.getLong(0) === 100L)
    assert(row.getString(1).length === 32)
    assert(row.getString(2) === "78787878") // 'x' = 0x78
    val frames = df.select(Multimodal.sampleFrames(col("content"), 16, 4).as("f"))
      .select(size(col("f"))).head().getInt(0)
    assert(frames === (100 - 1) / 64 + 1)
  }

  test("fake resize downsamples deterministically and idempotently on small inputs") {
    val big = (0 until 1000).map(_.toByte).toArray
    val small = Multimodal.fakeResize(big, 100)
    assert(small.length === 100)
    assert(small.toSeq === Multimodal.fakeResize(big, 100).toSeq)
    val tiny = Array[Byte](1, 2, 3)
    assert(Multimodal.fakeResize(tiny, 100).toSeq === tiny.toSeq)
  }

  private def encodeImage(format: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"JDK has no $format writer")
    bos.toByteArray
  }

  test("ImageDims parses real JDK-encoded PNG/JPEG/GIF headers") {
    for ((fmt, w, h) <- Seq(("png", 37, 21), ("jpg", 64, 48), ("gif", 5, 9))) {
      val bytes = encodeImage(fmt, w, h)
      val got = graft.functions.ImageDimsSupport.parse(bytes)
      assert(got != null, s"$fmt not recognized")
      val wantFmt = if (fmt == "jpg") "jpeg" else fmt
      assert(got === ((wantFmt, w, h)), s"$fmt: got $got")
    }
    assert(graft.functions.ImageDimsSupport.parse("not an image".getBytes) == null)
    assert(graft.functions.ImageDimsSupport.parse(Array.empty[Byte]) == null)
  }

  test("WavInfo parses a real JDK-encoded WAV header") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val nFrames = 250L
    val pcm = new Array[Byte](nFrames.toInt * fmt.getFrameSize)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val got = graft.functions.WavInfoSupport.parse(bos.toByteArray)
    assert(got === ((16000, 2, 16, 250L)))
    assert(graft.functions.WavInfoSupport.parse("RIFFjunk".getBytes) == null)
    assert(graft.functions.WavInfoSupport.parse("not audio".getBytes) == null)
  }

  test("WavInfo returns null (never throws) on sub-byte bit depths") {
    // hand-built RIFF/WAVE with a 4-bit (ADPCM-style) fmt chunk: bits/8 = 0
    // would divide by zero without the positive-multiple-of-8 guard
    def wavWithBits(bits: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def s(str: String) = bos.write(str.getBytes("US-ASCII"))
      def le16(v: Int) = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def le32(v: Int) = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
      s("RIFF"); le32(36 + 100); s("WAVE")
      s("fmt "); le32(16); le16(1); le16(1); le32(8000); le32(8000); le16(1); le16(bits)
      s("data"); le32(100)
      bos.toByteArray
    }
    assert(graft.functions.WavInfoSupport.parse(wavWithBits(4)) == null)
    assert(graft.functions.WavInfoSupport.parse(wavWithBits(12)) == null)
    // the same container with a legal byte-multiple depth still parses
    assert(graft.functions.WavInfoSupport.parse(wavWithBits(8)) === ((8000, 1, 8, 100L)))
  }

  test("Mp4Info parses v0 and v1 box layouts and never throws on hostile bytes") {
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

    val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
    // v0: 32-bit times, timescale 600, duration 1500 ticks -> 2500 ms
    val mvhd0 = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(1500))
    val tkhd0 = box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(1500) ++
      Array.fill[Byte](8 + 8 + 36)(0) ++ be32(320L << 16) ++ be32(240L << 16))
    val v0 = ftyp ++ box("moov", mvhd0 ++ box("trak", tkhd0))
    assert(graft.functions.Mp4InfoSupport.parse(v0) === (("isom", 600, 2500L, 320, 240)))

    // v1: 64-bit times, timescale 1000, duration 7250 -> 7250 ms
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(1000) ++ be64(7250))
    val tkhd1 = box("tkhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++
      be64(7250) ++ Array.fill[Byte](8 + 8 + 36)(0) ++ be32(1920L << 16) ++ be32(1080L << 16))
    val v1 = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd1))
    assert(graft.functions.Mp4InfoSupport.parse(v1) === (("isom", 1000, 7250L, 1920, 1080)))

    // audio-only (no trak): dims come back as -1 -> struct nulls
    val audioOnly = ftyp ++ box("moov", mvhd0)
    assert(graft.functions.Mp4InfoSupport.parse(audioOnly) === (("isom", 600, 2500L, -1, -1)))

    // hostile inputs: wrong magic, truncation mid-box, corrupt sizes
    assert(graft.functions.Mp4InfoSupport.parse("not a video at all".getBytes) == null)
    assert(graft.functions.Mp4InfoSupport.parse(v0.take(20)) == null)
    val corrupt = v0.clone(); corrupt(16) = 0x7f.toByte // moov size bogus-huge
    assert(graft.functions.Mp4InfoSupport.parse(corrupt) != null || true) // must not throw
    for (cut <- Seq(17, 33, 57, 90)) // arbitrary truncations must not throw
      graft.functions.Mp4InfoSupport.parse(v0.take(cut))
    // fuzz: deterministic pseudo-random garbage, sizes 0..64
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val arr = Array.fill[Byte](rnd.nextInt(65))(rnd.nextInt().toByte)
      graft.functions.Mp4InfoSupport.parse(arr) // no throw is the assertion
    }
    val _ = be16(0) // silence unused warning
  }

  test("ImageDims survives JPEG fill bytes and standalone markers before SOF") {
    // a real JDK JPEG, with 0xFF padding and a standalone RST0 marker
    // spliced in right after SOI — the marker walk must skip both instead
    // of reading a bogus length field
    val real = encodeImage("jpg", 40, 30)
    val spliced = Array[Byte](real(0), real(1), // SOI
      0xff.toByte, 0xff.toByte, 0xff.toByte,    // fill bytes
      0xff.toByte, 0xd0.toByte                  // standalone RST0 (no length)
    ) ++ real.drop(2)
    assert(graft.functions.ImageDimsSupport.parse(spliced) === (("jpeg", 40, 30)))
    // truncated mid-fill-run must return null, not over-read
    assert(graft.functions.ImageDimsSupport.parse(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xff.toByte)) == null)
  }

  test("real ImageIO decode: luma histogram is a distribution over real pixels") {
    // checkerboard: half the pixels pure white, half pure black
    val items = Seq(
      MediaItem(1L, "image", encodeImage("png", 8, 8), 0L),
      MediaItem(2L, "image", "not an image".getBytes, 12L)
    ).toDS()
    val feats = Multimodal.decodeImageHistogram(items, dim = 16, batchSize = 8).collect()
    val h1 = feats.find(_.mediaId == 1L).get.features
    assert(math.abs(h1.sum - 1.0f) < 1e-5) // normalized over all pixels
    assert(math.abs(h1(0) - 0.5f) < 1e-6 && math.abs(h1(15) - 0.5f) < 1e-6,
      s"checkerboard must split into the darkest and brightest bins: ${h1.toSeq}")
    assert(feats.find(_.mediaId == 2L).get.features.forall(_ == 0.0f))
  }

  test("batched fake decode: fixed dim, per-item isolation, deterministic") {
    val items = Seq(
      MediaItem(1L, "image", "hello world".getBytes, 11L),
      MediaItem(2L, "image", Array.empty[Byte], 0L),
      MediaItem(3L, "audio", "hello world".getBytes, 11L)
    ).toDS()
    val feats = Multimodal.decodeFeatures(items, dim = 4, batchSize = 2).collect()
    assert(feats.length === 3)
    assert(feats.forall(_.features.length === 4))
    val f1 = feats.find(_.mediaId == 1L).get
    val f3 = feats.find(_.mediaId == 3L).get
    assert(f1.features.toSeq === f3.features.toSeq) // content-determined
    assert(feats.find(_.mediaId == 2L).get.features.forall(_ == 0.0f))
  }
}
