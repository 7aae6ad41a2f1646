package graft

/** Self-run pair adjudication for [[Bench]]'s `--pair` mode: a Scala
  * port of `tools/bench_medians.py --check-pair` (same constants, same
  * two-run persistence rule) so one driver invocation ends with its own
  * verdict line without leaving the JVM — the round-17 blocker was that
  * the validated pair rule needs TWO runs while the driver produced one.
  * The python tool remains the offline authority; this port must match
  * it ([[BenchPairSpec]] pins the rule on shared fixtures).
  *
  * The rule (tools/bench_medians.py module doc): an entry FLAGS when it
  * trips BOTH axes (wall AND cpu, calibration-normalized, past their
  * floors) in BOTH runs, or its WALL axis trips in both runs with cpu
  * flat in at least one (persistent wall-only, escalated — host
  * contention does not follow one entry across two separate runs).
  * Anything tripping in only one run prints as a transient note.
  */
object BenchPair {
  private val Cal = "calibration_cpu"
  private val CalSerial = "calibration_serial"
  private val FlagRatio = 1.5
  private val WallAbsFloor = 0.5
  private val CpuAbsFloorMin = 2.0
  private val CpuAbsFloorFrac = 0.3

  /** Adjudicated environment-sensitive entries (must mirror
    * `tools/bench_medians.py` CANARIES): their trips print as canary
    * notes, never flags. q121 — the one entry flagging on driver-class
    * hosts across r16/r17 on byte-identical code — was attributed by
    * BenchOne isolation (r18, idle host): ~15-20 CPU-seconds of
    * one-time codegen + JIT tier-up of its fused md5 hash expressions
    * hide inside ~0.5s wall idle but stretch 2-4x on both axes when
    * co-tenancy starves the C2 compiler threads.
    */
  private val Canaries = Map(
    "q121_bloom_filter" ->
      ("JIT-compilation canary — one-time codegen+tier-up of its fused " +
        "md5 hash expressions (~15-20 cpu-s) amplifies compiler-thread " +
        "starvation under co-tenancy; environmental, see NOTES.md"))

  private final case class Detail(t: Double, norm: Double, med: Double,
      cpuNorm: Double, cpuMed: Double) {
    def fmt: String = {
      val base = f"$t%.2fs raw, $norm%.2fs normalized vs median $med%.2fs " +
        f"(${norm / med}%.2fx)"
      if (cpuMed > 0)
        base + f", cpu $cpuNorm%.2fs vs median $cpuMed%.2fs (${cpuNorm / cpuMed}%.2fx)"
      else base + ", no cpu medians (wall rule alone)"
    }
  }

  private def scaleOf(run: Map[String, Double], med: Map[String, Double],
      key: String): Double =
    (run.get(key), med.get(key)) match {
      case (Some(r), Some(m)) if r > 0 && m > 0 => r / m
      case _                                    => 1.0
    }

  private def exceedsWall(norm: Double, median: Double): Boolean =
    norm > FlagRatio * median && norm - median > WallAbsFloor

  private def exceedsCpu(norm: Double, median: Double): Boolean = {
    val floor = math.max(CpuAbsFloorMin, CpuAbsFloorFrac * median)
    norm > FlagRatio * median && norm - median > floor
  }

  /** One run's per-entry verdicts, mirroring the python `classify`:
    * "both" (both axes tripped), "wall" (wall tripped, cpu flat),
    * "flag_nocpu" (wall tripped, no cpu data — the wall rule alone
    * decides). Entries below the wall rule are absent.
    */
  private def classify(medians: Map[String, Double], cpuMedians: Map[String, Double],
      runWall: Map[String, Double], runCpu: Map[String, Double])
      : Map[String, (String, Detail)] = {
    val wallScale = scaleOf(runWall, medians, Cal)
    val cpuScale = scaleOf(runCpu, cpuMedians, Cal)
    runWall.flatMap { case (name, t) =>
      if (name == Cal || name == CalSerial || t < 0) None
      else medians.get(name).filter(_ > 0).flatMap { med =>
        val norm = t / wallScale
        if (!exceedsWall(norm, med)) None
        else {
          val cpuMed = cpuMedians.getOrElse(name, 0.0)
          val cpuT = runCpu.getOrElse(name, -1.0)
          if (cpuMed > 0 && cpuT >= 0) {
            val cpuNorm = cpuT / cpuScale
            val kind = if (exceedsCpu(cpuNorm, cpuMed)) "both" else "wall"
            Some(name -> (kind, Detail(t, norm, med, cpuNorm, cpuMed)))
          } else Some(name -> ("flag_nocpu", Detail(t, norm, med, -1.0, -1.0)))
        }
      }
    }
  }

  private def doubleMap(node: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] =
    if (node == null || !node.isObject) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      node.properties().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
    }

  /** The printed pair verdict over two in-process suite runs. Lines are
    * prefixed `[pair]` so the driver's captured tail separates them from
    * the JSON contract lines; the final summary line carries the flag
    * count a reader greps for.
    */
  def printVerdict(mediansPath: String,
      run1: Seq[(String, Double, Double)], run2: Seq[(String, Double, Double)]): Unit = {
    val f = new java.io.File(mediansPath)
    if (!f.isFile) {
      println(s"""[pair] no medians file at $mediansPath — pair verdict skipped""")
      return
    }
    try {
      val doc = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
      val medians = doubleMap(doc.get("medians"))
      val cpuMedians = doubleMap(doc.get("cpu_medians"))
      def walls(r: Seq[(String, Double, Double)]) =
        r.map { case (n, t, _) => n -> t }.toMap
      def cpus(r: Seq[(String, Double, Double)]) =
        r.map { case (n, _, c) => n -> c }.toMap
      val v1 = classify(medians, cpuMedians, walls(run1), cpus(run1))
      val v2 = classify(medians, cpuMedians, walls(run2), cpus(run2))
      // effective-core diagnostics per run: wall calibration (32-way)
      // moving while the serial one holds = lost cores, not a slow host
      Seq(("run1", run1), ("run2", run2)).foreach { case (label, r) =>
        val w = walls(r); val c = cpus(r)
        val wallScale = scaleOf(w, medians, Cal)
        val serialScale = scaleOf(w, medians, CalSerial)
        val cpuScale = scaleOf(c, cpuMedians, Cal)
        println(f"[pair] $label calibration: wall $wallScale%.3f, serial " +
          f"$serialScale%.3f, cpu $cpuScale%.3f, effective-core ratio " +
          f"${wallScale / math.max(serialScale, 1e-9)}%.3f")
      }
      val names = (v1.keySet ++ v2.keySet).toSeq.sorted
      var flagged = 0
      var transient = 0
      var canary = 0
      names.foreach { name =>
        (v1.get(name), v2.get(name)) match {
          case (Some(_), Some((_, d2))) if Canaries.contains(name) =>
            canary += 1
            println(s"[pair] note (canary, not flagged) $name: ${d2.fmt} — " +
              Canaries(name))
          case (Some((k1, _)), Some((k2, d2))) =>
            flagged += 1
            val why =
              if (Set(k1, k2).subsetOf(Set("both", "flag_nocpu"))) "persistent both-axis"
              else "persistent wall — escalated"
            println(s"[pair] FLAG $name ($why): latest run ${d2.fmt}")
          case (one, two) =>
            transient += 1
            val (kind, d) = one.orElse(two).get
            println(s"[pair] note (transient, one run of two) $name [$kind]: ${d.fmt}")
        }
      }
      println(s"[pair] verdict: $flagged flagged over two consecutive runs " +
        s"($transient transient single-run notes, $canary canary notes)")
    } catch { case e: Throwable =>
      println(s"[pair] verdict failed reading $mediansPath: $e")
    }
  }
}
