package graft

import org.apache.spark.sql.functions._

import graft.queries.LiveQueries.StubDoc
import graft.sources.{RangedCensus, StatusLiveRangedPartition, StatusLiveSource}

/** The O(groups) RANGED census plan (`censusRanges` option) — the
  * mega-fleet escape hatch: instead of materializing a per-token
  * census + watermark map on the driver at load() (~2.1 GB at 10M
  * tokens, LiveProbe §7), the planner streams the SORTED staged files
  * once and records one BYTE RANGE per group; each task reads its own
  * slice and drives the same per-subject page loops. Pins:
  *
  *   - the plan carries offsets, never subjects: G ranged partitions
  *     whose census ranges tile the file exactly, with the stops file
  *     merge-aligned so every subject's watermark lands in its group;
  *   - end-to-end equality with the materialized path: same rows,
  *     exactly once, per-subject watermarks applied on the wire;
  *   - a pushed subject constraint falls back to the materialized
  *     census (point lookups keep identical intersect semantics);
  *   - planCensusRanges unit contract: coverage, group count, stops
  *     alignment under missing/stray subjects.
  */
class StatusLiveRangedSpec extends SparkTestBase {

  private val BaseMs = 1704000000000L

  private def doc(subject: String, i: Int): StubDoc = {
    val ms = BaseMs + i * 1000L
    val iso = java.time.Instant.ofEpochMilli(ms)
    StubDoc(f"$subject-d$i%04d", subject, ms * 1000L,
      s"""{"id":"$subject-$i","subject":"$subject","source":"dimo/integration/live",""" +
        s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
        s""""type":"com.dimo.device.status","data":{"i":$i}}""")
  }

  private def stage(lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempFile("graft-ranged", ".txt")
    java.nio.file.Files.write(f,
      lines.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f.toString
  }

  private def url(s: com.sun.net.httpserver.HttpServer) =
    s"http://127.0.0.1:${s.getAddress.getPort}"

  test("censusRanges plans byte-range groups; tasks read their slices; watermarks apply") {
    // 10 subjects x 12 docs; EVEN subjects carry a watermark stopping
    // them at doc 6 (exclusive) — the wire must ship 12 docs for odd
    // subjects, 6 for even ones
    val docs: IndexedSeq[StubDoc] =
      (for (s <- 0 until 10; i <- 0 until 12) yield doc(f"a$s", i)).toIndexedSeq
    val census = (0 until 10).map(s => s"a$s")
    val stops = (0 until 10 by 2).map(s => s"a$s\t${BaseMs + 6000}")
    val cPath = stage(census)
    val sPath = stage(stops)
    val served = new java.util.concurrent.atomic.AtomicLong
    val server = graft.queries.LiveQueries.startStub(docs, served = served)
    try {
      val live = spark.read.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "50")
        .option("subjectsPath", cPath).option("stopBySubjectPath", sPath)
        .option("censusRanges", "4").load()
      assert(live.rdd.getNumPartitions === 4, "one task per byte-range group")
      val got = live.select(col("subject"), col("id")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      val expected = (for {
        s <- 0 until 10
        i <- 0 until (if (s % 2 == 0) 6 else 12)
      } yield (s"a$s", s"a$s-$i")).toSet
      assert(got.length === expected.size && got.toSet === expected,
        "exactly-once with per-subject watermarks applied")
      // the watermark reached the WIRE: each subject fits one page, so
      // the server must have shipped exactly the surviving rows
      assert(served.get() === expected.size.toLong,
        "stopped windows must not ship rows the plan then discards")
    } finally server.stop(0)
  }

  test("the ranged plan carries OFFSETS that tile the census exactly (no subject lists)") {
    val census = (0 until 17).map(s => f"b$s%02d")
    val stops = Seq("b03\t123", "b07\t456", "b15\t789")
    val cPath = stage(census)
    val sPath = stage(stops)
    val docs: IndexedSeq[StubDoc] = census.map(doc(_, 0)).toIndexedSeq
    val server = graft.queries.LiveQueries.startStub(docs)
    try {
      val scan = new graft.sources.StatusLiveScan(url(server), "device-status", 50,
        0L, StatusLiveSource.DefaultStopMs, None, Map.empty,
        Array.empty, graft.sources.StatusV2Source.Schema,
        rangedCensus = Some(RangedCensus(cPath, Some(sPath), 5)))
      val parts = scan.planInputPartitions().toSeq
        .map(_.asInstanceOf[StatusLiveRangedPartition])
      assert(parts.length === 5)
      // census ranges tile the file: contiguous, gap-free, and reading
      // every slice back reconstructs the census exactly
      parts.sliding(2).foreach { case Seq(a, b) =>
        assert(a.censusEnd === b.censusStart, "census ranges must be contiguous")
      }
      val readBack = parts.flatMap(p =>
        StatusLiveSource.readRange(p.censusPath, p.censusStart, p.censusEnd))
      assert(readBack === census, "slices reconstruct the census in order")
      // stops align: every watermark is readable from ITS subject's group
      val bySubjectStops = parts.flatMap(p =>
        StatusLiveSource.readRange(sPath, p.stopsStart, p.stopsEnd).map { line =>
          val sub = line.takeWhile(_ != '\t')
          sub -> p
        }).toMap
      Seq("b03", "b07", "b15").foreach { s =>
        val p = bySubjectStops(s)
        val groupSubjects =
          StatusLiveSource.readRange(p.censusPath, p.censusStart, p.censusEnd)
        assert(groupSubjects.contains(s),
          s"watermark for $s must land in the group that owns $s")
      }
    } finally server.stop(0)
  }

  test("a pushed subject constraint falls back to the materialized census (identical semantics)") {
    val docs: IndexedSeq[StubDoc] =
      (for (s <- 0 until 6; i <- 0 until 8) yield doc(f"c$s", i)).toIndexedSeq
    val census = (0 until 6).map(s => s"c$s")
    val stops = Seq(s"c2\t${BaseMs + 4000}")
    val cPath = stage(census)
    val sPath = stage(stops)
    val server = graft.queries.LiveQueries.startStub(docs)
    try {
      val live = spark.read.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "50")
        .option("subjectsPath", cPath).option("stopBySubjectPath", sPath)
        .option("censusRanges", "4").load()
      // equality: census ∩ {c2} = {c2}; its watermark still applies
      val one = live.where(col("subject") === "c2")
      assert(one.rdd.getNumPartitions === 1, "a point lookup plans one group, not ranges")
      assert(one.select(col("id")).collect().map(_.getString(0)).sorted ===
        (0 until 4).map(i => s"c2-$i").toArray.sorted)
      // a subject OUTSIDE the census intersects to nothing
      assert(live.where(col("subject") === "zz").count() === 0L)
    } finally server.stop(0)
  }

  test("planCensusRanges unit contract: counts, coverage, stray/missing stops subjects") {
    val census = Seq("m1", "m3", "m5", "m7", "m9")
    // a stop BELOW the first census subject (stray — inert) and one past
    // the last group's subjects; m5's sits in the middle
    val stops = Seq("a0\t1", "m5\t2", "zz\t3")
    val cPath = stage(census)
    val sPath = stage(stops)
    val ranges = StatusLiveSource.planCensusRanges(cPath, Some(sPath), 2)
    assert(ranges.length === 2)
    val subjects = ranges.map(r => StatusLiveSource.readRange(cPath, r.cStart, r.cEnd))
    assert(subjects.flatten === census)
    // every stops line lands in exactly one range; lookups are by
    // subject so strays are inert
    val stopLines = ranges.flatMap(r => StatusLiveSource.readRange(sPath, r.sStart, r.sEnd))
    assert(stopLines.contains("m5\t2"))
    assert(stopLines.toSet.subsetOf(stops.toSet))
    // more groups than subjects clamps; zero-subject census plans nothing
    assert(StatusLiveSource.planCensusRanges(cPath, None, 99).length === census.length)
    val empty = stage(Seq.empty)
    assert(StatusLiveSource.planCensusRanges(empty, None, 4).isEmpty)
  }

  test("the streaming tail plans ranged groups per micro-batch (census bounds the stream)") {
    // the census applies to the TAIL too: each micro-batch window plans
    // its own byte-range groups (the plan cache keys per window, so a
    // fresh batch re-plans), census subjects flow, strangers never do
    val docs: IndexedSeq[StubDoc] =
      ((for (s <- 0 until 6; i <- 0 until 5) yield doc(f"e$s", i)) ++
        (0 until 5).map(doc("zz", _))).toIndexedSeq // zz: NOT in the census
    val census = (0 until 6).map(s => s"e$s")
    val cPath = stage(census)
    val server = graft.queries.LiveQueries.startStub(docs)
    try {
      val q = spark.readStream.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "50")
        .option("subjectsPath", cPath).option("censusRanges", "3").load()
        .select(col("subject"), col("id"))
        .writeStream.format("memory").queryName("ranged_tail").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.sql("SELECT subject, id FROM ranged_tail").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val expected = (for (s <- 0 until 6; i <- 0 until 5)
        yield (s"e$s", s"e$s-$i")).toSet
      assert(got.toSet === expected && got.length === expected.size,
        "census subjects exactly once; out-of-census subjects never flow")
    } finally server.stop(0)
  }

  test("UNSORTED staged files are rejected loudly (a misaligned watermark would overship silently)") {
    // group tiling survives any order, but the stops merge-walk aligns by
    // subject order — an unsorted input would park a watermark outside
    // its subject's group and the scan would quietly read past the stop
    val sortedC = stage(Seq("n1", "n2", "n3", "n4"))
    val unsortedC = stage(Seq("n2", "n1", "n3", "n4"))
    val unsortedS = stage(Seq("n3\t5", "n1\t7"))
    val e1 = intercept[IllegalArgumentException](
      StatusLiveSource.planCensusRanges(unsortedC, None, 2))
    assert(e1.getMessage.contains("SORTED census"))
    val e2 = intercept[IllegalArgumentException](
      StatusLiveSource.planCensusRanges(sortedC, Some(unsortedS), 2))
    assert(e2.getMessage.contains("SORTED stops"))
  }

  test("property: random censuses and stops tile and align exactly (seeded, 500 trials)") {
    // byte-offset math is where off-by-ones hide, and multi-byte UTF-8
    // subjects are where byte offsets and character counts diverge — the
    // alphabet mixes 1-, 2- and 3-byte code points deliberately. Three
    // invariants per trial: tiles reconstruct the census exactly; every
    // stop lands in the range whose tile owns its subject; every stop
    // appears in exactly one range.
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abXYZ0189éü中"
    for (trial <- 0 until 500) {
      val n = 1 + rnd.nextInt(60)
      def subj(): String =
        (0 to rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val census = Seq.fill(n)(subj()).distinct.sorted
      val stopsSubjects = census.filter(_ => rnd.nextBoolean())
      val stops = stopsSubjects.map(s => s"$s\t${1700000000000L + rnd.nextInt(1000)}")
      val cPath = stage(census)
      val sPath = stage(stops)
      try {
        val g = 1 + rnd.nextInt(8)
        val ranges = StatusLiveSource.planCensusRanges(cPath, Some(sPath), g)
        // per-group size rounds UP (ceil(n/g) subjects each), so the
        // group count is ceil(n/per) — at most g, never more
        val per = (census.length + math.min(g, census.length) - 1) /
          math.min(g, census.length)
        assert(ranges.length === (census.length + per - 1) / per,
          s"trial $trial group count (n=${census.length} g=$g)")
        assert(ranges.length <= g, s"trial $trial: more groups than requested")
        val tiles = ranges.map(r => StatusLiveSource.readRange(cPath, r.cStart, r.cEnd))
        assert(tiles.flatten === census, s"trial $trial: tiles must reconstruct the census")
        val stopsOf = ranges.zip(tiles).flatMap { case (r, tile) =>
          StatusLiveSource.readRange(sPath, r.sStart, r.sEnd).map { line =>
            (line.takeWhile(_ != '\t'), tile)
          }
        }
        stopsOf.foreach { case (s, tile) =>
          assert(tile.contains(s), s"trial $trial: stop for '$s' landed outside its tile")
        }
        assert(stopsOf.map(_._1).sorted === stopsSubjects.sorted,
          s"trial $trial: every stop in exactly one range")
      } finally {
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(cPath))
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(sPath))
      }
    }
  }

  test("censusRanges without subjectsPath is refused at load (a dropped stops file would overship)") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-status-live")
        .option("url", "http://127.0.0.1:9").option("censusRanges", "4")
        .option("stopBySubjectPath", "/nonexistent").load()
    }
    assert(e.getMessage.contains("censusRanges requires subjectsPath"))
  }
}
