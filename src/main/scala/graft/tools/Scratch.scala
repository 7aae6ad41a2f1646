package graft.tools

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** Ad-hoc plan/perf probe (not part of the driver contract).
  *
  * Current experiment: the live ES decode path's serialize+reparse cost —
  * each `_search` hit arrives as a PARSED JsonNode, is rendered back to
  * bytes (`src.toString.getBytes`) to ride the shared [[graft.sources
  * .LineSource]] transport, and the shared decode re-parses it
  * (`mapper.readTree(line)`). Measures (a) the full
  * render→reparse→extract pipeline vs (b) extracting straight from the
  * already-parsed node — the upper bound a node-level decode core could
  * recover.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(1000000)
    val mapper = new ObjectMapper()
    val docs: IndexedSeq[com.fasterxml.jackson.databind.JsonNode] =
      (0 until n).map { i =>
        mapper.readTree(
          s"""{"id":"e$i","subject":"s${i % 1000}","source":"dimo/integration/live",""" +
            s""""specversion":"1.0","time":"2024-01-01T00:0${i % 6}:00Z",""" +
            s""""dataschema":"dimo.zone.status/v2.0","type":"com.dimo.device.status",""" +
            s""""data":{"vehicle":{"cents":$i}}}""")
      }
    def extract(node: com.fasterxml.jackson.databind.JsonNode): Long = {
      var h = 0L
      val s = node.get("subject"); if (s != null && s.isTextual) h ^= s.asText().hashCode
      val t = node.get("time"); if (t != null && t.isTextual)
        h ^= java.time.Instant.parse(t.asText()).toEpochMilli
      val d = node.get("data"); if (d != null) h ^= d.toString.hashCode
      h
    }
    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val x = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $name%-28s $s%6.2f s  (${n / s}%.0f docs/s, $x)")
      s
    }
    // warm both paths
    (0 until 2).foreach { _ =>
      var i = 0; var acc = 0L
      while (i < math.min(n, 100000)) {
        val bytes = docs(i).toString.getBytes(StandardCharsets.UTF_8)
        acc ^= extract(mapper.readTree(bytes)); acc ^= extract(docs(i)); i += 1
      }
    }
    val a = time("render+reparse+extract") {
      var i = 0; var acc = 0L
      while (i < n) {
        val bytes = docs(i).toString.getBytes(StandardCharsets.UTF_8)
        acc ^= extract(mapper.readTree(bytes))
        i += 1
      }
      acc
    }
    val b = time("direct node extract") {
      var i = 0; var acc = 0L
      while (i < n) { acc ^= extract(docs(i)); i += 1 }
      acc
    }
    println(f"[scratch] serialize+reparse overhead: ${a / b}%.2fx of the extract-only cost; " +
      f"savings bound if the decode went node-level: ${(a - b) / a * 100}%.0f%% of decode CPU")
  }
}
