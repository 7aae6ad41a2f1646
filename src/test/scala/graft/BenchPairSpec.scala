package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchPair]] is the in-JVM port of `tools/bench_medians.py
  * --check-pair` — the two implementations must agree or the driver's
  * self-run verdict lies about what the offline authority would say.
  * One fixture exercises every verdict class:
  *
  *   qA — both axes trip in both runs  -> FLAG persistent both-axis
  *   qB — wall trips in both, cpu flat -> FLAG persistent wall (escalated)
  *   qC — trips in run 1 only          -> transient note
  *   qD — below the wall rule          -> absent
  *   q121_bloom_filter — both axes in both runs but a NAMED CANARY
  *        (adjudicated environment-sensitive) -> canary note, never a flag
  *
  * and the python tool is run on the SAME fixture (json files) to pin
  * cross-implementation agreement, not just the Scala port's own
  * expectations.
  */
class BenchPairSpec extends AnyFunSuite {

  private val medians =
    """{"medians":{"calibration_cpu":10.0,"calibration_serial":10.0,
      |"qA":1.0,"qB":1.0,"qC":1.0,"qD":1.0,"q121_bloom_filter":0.5},
      |"cpu_medians":{"calibration_cpu":320.0,
      |"qA":10.0,"qB":10.0,"qC":10.0,"qD":10.0,"q121_bloom_filter":2.5}}""".stripMargin

  // (name, wall, cpu) — calibrations at their medians (scale 1.0)
  private val run1: Seq[(String, Double, Double)] = Seq(
    ("calibration_cpu", 10.0, 320.0), ("calibration_serial", 10.0, 10.0),
    ("qA", 3.0, 30.0), ("qB", 3.0, 10.0), ("qC", 3.0, 30.0), ("qD", 1.2, 10.0),
    ("q121_bloom_filter", 2.4, 20.0))
  private val run2: Seq[(String, Double, Double)] = Seq(
    ("calibration_cpu", 10.0, 320.0), ("calibration_serial", 10.0, 10.0),
    ("qA", 3.1, 31.0), ("qB", 3.1, 10.0), ("qC", 1.0, 10.0), ("qD", 1.2, 10.0),
    ("q121_bloom_filter", 1.2, 12.0))

  private def runJson(r: Seq[(String, Double, Double)]): String = {
    def m(f: ((String, Double, Double)) => Double) =
      r.map(e => s""""${e._1}":${f(e)}""").mkString("{", ",", "}")
    s"""{"metric":"total","value":${r.map(_._2).sum},"unit":"sec",""" +
      s""""queries":${m(_._2)},"cpu_queries":${m(_._3)},"sf":"x"}"""
  }

  private def write(content: String, suffix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("graft-benchpair", suffix)
    java.nio.file.Files.writeString(p, content)
    p
  }

  test("the Scala pair verdict classifies every fixture class like the python rule") {
    val medPath = write(medians, ".json")
    val out = new java.io.ByteArrayOutputStream()
    try Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      BenchPair.printVerdict(medPath.toString, run1, run2)
    } finally java.nio.file.Files.deleteIfExists(medPath)
    val lines = out.toString("UTF-8").linesIterator.toSeq
    assert(lines.exists(l => l.contains("FLAG qA (persistent both-axis)")),
      s"qA must flag both-axis: $lines")
    assert(lines.exists(l => l.contains("FLAG qB (persistent wall — escalated)")),
      s"qB must escalate wall-only persistence: $lines")
    assert(lines.exists(l => l.contains("transient, one run of two) qC")),
      s"qC must demote to a transient note: $lines")
    assert(!lines.exists(_.contains("qD")), s"qD is below the rule: $lines")
    assert(lines.exists(l => l.contains("note (canary, not flagged) q121_bloom_filter")),
      s"a named canary must demote to a canary note: $lines")
    assert(!lines.exists(l => l.contains("FLAG q121")), s"canaries never flag: $lines")
    assert(lines.exists(_.contains("verdict: 2 flagged over two consecutive runs " +
      "(1 transient single-run notes, 1 canary notes)")), s"summary line: $lines")
    assert(lines.exists(l => l.contains("effective-core ratio 1.000")),
      s"calibrations at medians read ratio 1.0: $lines")
  }

  test("missing medians file degrades to a skip note, never a throw") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      BenchPair.printVerdict("/nonexistent/medians.json", run1, run2)
    }
    assert(out.toString("UTF-8").contains("pair verdict skipped"))
  }

  test("cross-check: the python authority reaches the same verdicts on the same fixture") {
    val medPath = write(medians, ".json")
    val r1Path = write(runJson(run1), ".json")
    val r2Path = write(runJson(run2), ".json")
    try {
      val cmd = Seq("python3", "tools/bench_medians.py", "--check-pair",
        medPath.toString, r1Path.toString, r2Path.toString)
      val outBuf = new StringBuilder
      val code = scala.sys.process.Process(cmd, new java.io.File("."))
        .!(scala.sys.process.ProcessLogger(l => outBuf.append(l).append('\n'), _ => ()))
      assert(code === 0, s"python check-pair failed:\n$outBuf")
      val py = outBuf.toString
      assert(py.contains("FLAG qA (persistent both-axis)"), py)
      // match up to the em dash: ProcessLogger decodes with the platform
      // charset, which may mangle multi-byte punctuation
      assert(py.contains("FLAG qB (persistent wall"), py)
      assert(py.contains("transient, one run of two) qC"), py)
      assert(!py.contains("qD"), py)
      assert(py.contains("note (canary, not flagged) q121_bloom_filter"), py)
      assert(!py.contains("FLAG q121"), py)
      assert(py.contains("2 flagged over two consecutive runs"), py)
    } finally Seq(medPath, r1Path, r2Path)
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }
}
