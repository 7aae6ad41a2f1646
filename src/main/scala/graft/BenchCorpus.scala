package graft

import java.nio.file.Files
import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Builds the reference CI e2e corpus for the ingestion benchmark: the 8
  * fixture status docs replicated 1000× with synthetic times
  * `2020-01-01T00:00:00Z + (i+1)ms` and subjects "1".."8" (reference
  * `internal/sync/test/sync_test.go:269-298`), as NDJSON.
  */
object BenchCorpus {

  def write8000DocCorpus(): String = {
    val mapper = new ObjectMapper()
    val arr = mapper.readTree(getClass.getResourceAsStream("/static_vehicle_data_test.json"))
    val first = Instant.parse("2020-01-01T00:00:00Z").toEpochMilli
    val sb = new StringBuilder
    for (i <- 0 until 1000; j <- 0 until 8) {
      val d = arr.get(j).deepCopy[ObjectNode]()
      d.put("subject", (j + 1).toString)
      d.put("time", Instant.ofEpochMilli(first + i + 1).toString)
      sb.append(mapper.writeValueAsString(d)).append('\n')
    }
    val p = Files.createTempFile("graft-bench-corpus", ".ndjson")
    Files.writeString(p, sb.toString)
    p.toString
  }
}
