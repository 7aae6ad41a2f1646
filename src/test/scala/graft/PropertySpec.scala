package graft

import java.nio.file.Files

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the two pieces of round-2 code whose
  * correctness depends on boundary arithmetic rather than a fixed
  * example: byte-range line ownership in the DSv2 source, and the PPJoin
  * candidate filters (which must be LOSSLESS prunes of the brute-force
  * Jaccard join for any corpus).
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark = SparkSessionHolder.spark

  private def checkProp(p: Prop, min: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  test("byte-range splits partition a file's lines exactly, for any split size") {
    val lineGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val fileGen = Gen.nonEmptyListOf(lineGen)
    checkProp(Prop.forAll(fileGen, Gen.choose(1, 64)) { (lines, splitBytes) =>
      val p = Files.createTempFile("graft-prop-lines", ".txt")
      try {
        val content = lines.mkString("\n")
        Files.writeString(p, content)
        val len = p.toFile.length()
        val nSplits = math.max(1, ((len + splitBytes - 1) / splitBytes).toInt)
        val collected = (0 until nSplits).flatMap { i =>
          val start = i.toLong * splitBytes
          val end = math.min(start + splitBytes, len)
          val next = graft.sources.TestHooks.byteRangeLines(p.toString, start, end)
          Iterator.continually(next()).takeWhile(_ != null)
            .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8)).toList
        }
        collected == lines
      } finally Files.delete(p)
    }, min = 100)
  }

  test("PPJoin filters are lossless: ngramJaccardJoin == brute-force Jaccard") {
    import spark.implicits._
    // Small vocab so shared shingles (and near-dups) actually occur.
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(4, 14).flatMap(n => Gen.listOfN(n, docGen))
    checkProp(Prop.forAllNoShrink(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val fast = Dedup.ngramJaccardJoin(docs, "doc_id", "text", k = 2, tNum = 1, tDen = 2)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // brute force: all pairs, exact Jaccard over the same shingle sets
      val sets = Dedup.shingleSets(docs, "doc_id", "text", k = 2)
        .as[(Long, Array[Long])].collect().toMap
      val ids = sets.keys.toSeq.sorted
      val brute = (for {
        i <- ids; j <- ids if i < j
        a = sets(i).toSet; b = sets(j).toSet
        inter = (a & b).size
      } yield ((i, j), inter.toDouble / (a.size + b.size - inter))).collect {
        case (p, jac) if jac >= 0.5 => p
      }.toSet
      if (fast != brute) println(s"MISMATCH fast=$fast brute=$brute texts=$texts")
      fast == brute
    }, min = 15)
  }

  test("CanonAlnum equals the lower/regex/trim chain for any string") {
    import org.apache.spark.unsafe.types.UTF8String
    val charGen = Gen.frequency(
      5 -> Gen.alphaNumChar,
      3 -> Gen.const(' '),
      2 -> Gen.oneOf('!', '?', '.', ',', ';', 'É', 'ß', 'Ω', '中', '\t', '\n', 'İ'),
      1 -> Gen.choose(32.toChar, 0x2fff.toChar)
    )
    checkProp(Prop.forAll(Gen.listOf(charGen).map(_.mkString)) { s =>
      val u = UTF8String.fromString(s)
      val got = graft.functions.CanonSupport.canonAlnum(u).toString
      // Same chain q75's oracle replays: Spark's lower() (UTF8String
      // case-folding), the two regexes, trim.
      val ref = u.toLowerCase.toString
        .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
      got == ref
    }, min = 300)
  }

  test("CharGramHash32 equals the md5/substr reference for any string") {
    import org.apache.spark.unsafe.types.UTF8String
    val pieceGen = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.const(" "),
      1 -> Gen.oneOf("É", "ß", "Ω", "中", "🚀") // multi-byte (incl. 4-byte) path
    )
    def refHash(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    checkProp(Prop.forAll(Gen.listOf(pieceGen).map(_.mkString), Gen.choose(1, 8)) { (s, k) =>
      val got = graft.functions.HashSupport
        .charGramHashes(UTF8String.fromString(s), k).toLongArray().toSeq
      // reference: md5 of every k-char (code-point) window — what the
      // DuckDB oracle computes with substr+md5
      val cps = s.codePoints().toArray
      val ref =
        if (cps.length < k) Seq.empty[Long]
        else (0 to cps.length - k).map(i => refHash(new String(cps, i, k)))
      got == ref
    }, min = 300)
  }

  test("media header parsers terminate and never throw on arbitrary bytes") {
    val raw = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    // bias toward valid magics so the deeper walk paths (marker/chunk
    // loops over hostile sizes) actually execute
    val seeded = Gen.oneOf(
      raw,
      raw.map(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++ _),
      raw.map(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ _),
      raw.map("RIFF1234WAVE".getBytes ++ _),
      raw.map("GIF89a".getBytes ++ _)
    )
    checkProp(Prop.forAll(seeded) { bytes =>
      graft.functions.ImageDimsSupport.parse(bytes)
      graft.functions.WavInfoSupport.parse(bytes)
      true // reaching here = no throw, no hang
    }, min = 500)
  }

  test("CanonAlnum column matches the regex-chain column on the documents corpus") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chain = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val mismatches = docs
      .select(graft.functions.CanonicalizeExpressions.canonAlnum(col("text")).as("a"), chain.as("b"))
      .where(not(col("a") <=> col("b")))
      .count()
    assert(mismatches == 0L)
  }

  test("merge joins equal their composition oracles on random histories (nulls, ties, dupes)") {
    import spark.implicits._
    // random (key, time) rows over a SMALL domain so collisions, exact
    // ties, null keys/times, and duplicate (key, time) pairs all occur
    val rowGen = for {
      key <- Gen.frequency(9 -> Gen.choose(0L, 5L).map(Option(_)), 1 -> Gen.const(None))
      t <- Gen.frequency(9 -> Gen.choose(0L, 40L).map(Option(_)), 1 -> Gen.const(None))
    } yield (key, t)
    val dsGen = Gen.listOfN(60, rowGen)
    checkProp(Prop.forAll(dsGen, dsGen, Gen.choose(0L, 10L)) { (ls, rs, w) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("p_event", "user_id", "p_us")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (10000L + i, k, t) }
        .toDF("r_event", "uid", "r_us")

      val merge = graft.plans.RangeMergeJoin(left, right,
          "user_id", "uid", "p_us", "r_us", w, Seq("r_event" -> "r_event"))
        .select("p_event", "r_event").as[(Long, Long)].collect().sorted.toSeq
      val naive = left.join(right,
          left("user_id") === right("uid") && abs(left("p_us") - right("r_us")) <= w)
        .select("p_event", "r_event").as[(Long, Long)].collect().sorted.toSeq

      val asof = graft.plans.AsofMergeJoin(left, right,
          "user_id", "uid", "p_us", "r_us", Seq("r_us" -> "m_rus"))
        .select(col("p_event"), col("m_rus")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      // as-of oracle: max right time ≤ left time per key, via plain SQL
      val asofOracle = left.join(right,
          left("user_id") === right("uid") && right("r_us") <= left("p_us"), "left")
        .groupBy(col("p_event")).agg(max(col("r_us")).as("m"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

      merge == naive && asof == asofOracle
    }, min = 8)
  }

  test("naturalNameOrder is a total order with numeric-run semantics (r9 part ordering)") {
    val ord = graft.sources.ShardedSignalSource.naturalNameOrder
    val nameGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString),
      Gen.choose(0L, 999999L).map(_.toString),
      Gen.const("0"), Gen.const("00"), Gen.const("007")))
      .map(_.mkString("-"))
    checkProp(Prop.forAll(nameGen, nameGen, nameGen) { (a, b, c) =>
      def sg(x: String, y: String) = math.signum(ord.compare(x, y))
      val antisym = sg(a, b) == -sg(b, a)
      val refl = ord.compare(a, a) == 0
      def le(x: String, y: String) = ord.compare(x, y) <= 0
      val trans = !(le(a, b) && le(b, c)) || le(a, c)
      // distinct names must never compare equal (activeParts determinism):
      // numerically-equal digit runs fall through to the raw-string order
      val strict = ord.compare(a, b) != 0 || a == b
      antisym && refl && trans && strict
    }, min = 500)
    // numeric epoch semantics: e<N> ordering is Long ordering
    checkProp(Prop.forAll(Gen.choose(0L, 1000000L), Gen.choose(0L, 1000000L)) { (x, y) =>
      math.signum(ord.compare(s"part-e$x-0-0.csv", s"part-e$y-0-0.csv")) ==
        math.signum(java.lang.Long.compare(x, y))
    }, min = 300)
  }

  test("TokenBloom never false-negatives, for any token set (r9 skip index)") {
    checkProp(Prop.forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))) { toks =>
      val b = graft.sources.TokenBloom.empty()
      toks.foreach(graft.sources.TokenBloom.add(b, _))
      toks.forall(graft.sources.TokenBloom.mightContain(b, _)) &&
        // codec round trip preserves every bit
        graft.sources.TokenBloom.fromBase64(
          graft.sources.TokenBloom.toBase64(b)).get.sameElements(b)
    }, min = 100)
  }
}
