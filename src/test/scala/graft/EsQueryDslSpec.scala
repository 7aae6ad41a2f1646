package graft

import java.sql.Timestamp

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EsQueryDsl

/** The generated search request must be byte-equivalent (as JSON trees) to
  * the reference's `GetRecordsSince` construction
  * (internal/service/elastic/elastic.go:46-108): match + string-millis
  * range in bool.filter, desc time sort, size, and the exists/_source
  * projection block only when fields are required.
  */
class EsQueryDslSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private val start = Timestamp.valueOf("2024-01-01 00:00:00")
  private val end = Timestamp.valueOf("2024-01-02 00:00:00")
  private val filters = Seq(
    EqualTo("subject", "veh-1"),
    GreaterThanOrEqual("time", start),
    LessThan("time", end))

  test("full request with required fields matches the reference shape") {
    val got = mapper.readTree(EsQueryDsl.searchRequest(filters, Seq("speed", "soc"), 500))
    val want = mapper.readTree(
      s"""{
        "query": {"bool": {
          "filter": [
            {"match": {"subject": {"query": "veh-1"}}},
            {"range": {"time": {"gte": "${start.getTime}", "lt": "${end.getTime}"}}}
          ],
          "should": [
            {"exists": {"field": "speed"}},
            {"exists": {"field": "soc"}}
          ],
          "minimum_should_match": 1
        }},
        "_source": {"includes":
          ["subject", "dataschema", "id", "source", "time", "type", "speed", "soc"]},
        "size": 500,
        "sort": [{"time": {"order": "desc"}}]
      }""")
    assert(got === want)
  }

  test("no required fields ⇒ no should/_source block (full _source, reference default)") {
    val got = mapper.readTree(EsQueryDsl.searchRequest(filters, Nil, 1000))
    assert(!got.has("_source"))
    assert(!got.path("query").path("bool").has("should"))
    assert(!got.path("query").path("bool").has("minimum_should_match"))
    assert(got.path("size").asInt() === 1000)
    assert(got.path("sort").get(0).path("time").path("order").asText() === "desc")
  }

  test("range is half-open and millis are strings, exactly as the client sends") {
    val got = mapper.readTree(EsQueryDsl.searchRequest(filters, Nil, 10))
    val range = got.path("query").path("bool").path("filter").get(1).path("range").path("time")
    assert(range.path("gte").isTextual && range.path("lt").isTextual)
    assert(range.path("gte").asText() === start.getTime.toString)
    assert(range.path("lt").asText() === end.getTime.toString)
    assert(!range.has("gt") && !range.has("lte"))
  }

  test("the streaming offset probe is a size-0 max-time aggregation") {
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(EsQueryDsl.maxTimeRequest)
    assert(m.path("size").asInt(-1) === 0, "no hits may ship with the probe")
    assert(m.path("aggs").path("max_time").path("max").path("field").asText() === "time")
  }

  test("envelope-only projection: pure _source.includes, never exists clauses") {
    val body = EsQueryDsl.searchRequest(Seq.empty, Seq.empty, 10,
      envelopeIncludes = EsQueryDsl.RootFields)
    val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(n.path("_source").path("includes").size() === EsQueryDsl.RootFields.size)
    assert(n.path("query").path("bool").path("should").isMissingNode,
      "a projection must not change the row set")
  }

  test("duplicate range conjuncts tighten: max of gte, min of lt") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val body = EsQueryDsl.searchRequest(Seq(
      GreaterThanOrEqual("time", 100L), GreaterThanOrEqual("time", 250L),
      LessThan("time", 900L), LessThan("time", 700L)), Seq.empty, 10)
    val r = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      .path("query").path("bool").path("filter").get(0).path("range").path("time")
    assert(r.path("gte").asText() === "250" && r.path("lt").asText() === "700")
  }

  test("pushed TopN direction surfaces in the sort clause") {
    val desc = mapper.readTree(EsQueryDsl.searchRequest(filters, Nil, 10, sortDesc = true))
    assert(desc.path("sort").get(0).path("time").path("order").asText() === "desc")
    val asc = mapper.readTree(EsQueryDsl.searchRequest(filters, Nil, 10, sortDesc = false))
    assert(asc.path("sort").get(0).path("time").path("order").asText() === "asc")
    assert(asc.path("size").asInt() === 10)
  }

  test("the count probe opts into exact totals (track_total_hits), plain requests never do") {
    val probe = mapper.readTree(EsQueryDsl.searchRequest(filters, Nil, 0, trackTotalHits = true))
    assert(probe.path("track_total_hits").asBoolean(false),
      "without it ES caps hits.total at 10k and the count is unusable for statistics")
    val page = mapper.readTree(EsQueryDsl.searchRequest(filters, Nil, 100))
    assert(page.path("track_total_hits").isMissingNode,
      "data pages must not pay exact-count bookkeeping")
  }

  test("the search_after drain request: _id ascending cursor within the window, projection intact") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val tie = 1704000000123L
    val win: Seq[org.apache.spark.sql.sources.Filter] =
      Seq(GreaterThanOrEqual("time", tie), LessThan("time", tie + 1))
    val first = mapper.readTree(
      EsQueryDsl.searchAfterRequest(win, Seq("data.speed"), 500, after = None))
    assert(first.path("sort").get(0).path("_id").asText() === "asc")
    assert(first.path("search_after").isMissingNode, "no cursor on the first drain page")
    val range = first.path("query").path("bool").path("filter").get(0).path("range").path("time")
    assert(range.path("gte").asText() === tie.toString &&
      range.path("lt").asText() === (tie + 1).toString,
      "the drain windows EXACTLY the tied millisecond")
    // a configured signal filter applies to drained pages too
    assert(first.path("query").path("bool").path("should").get(0)
      .path("exists").path("field").asText() === "data.speed")
    assert(first.path("_source").path("includes").size() ===
      EsQueryDsl.RootFields.size + 1)
    val next = mapper.readTree(
      EsQueryDsl.searchAfterRequest(win, Seq.empty, 500, after = Some("doc-0042")))
    assert(next.path("search_after").get(0).asText() === "doc-0042",
      "subsequent pages carry the last hit's _id as the exclusive cursor")
  }

  test("configurable PIT keep-alive rides every PIT request (and bad durations are rejected at parse)") {
    // every PIT request REFRESHES the keep-alive, so it bounds the gap
    // between one task's page requests — a stall-prone downstream raises
    // it via the `pitKeepAlive` wire option instead of dying on a
    // search_context_missing whose retries reuse the same dead snapshot
    val req = mapper.readTree(EsQueryDsl.pitSearchAfterRequest(
      Seq(EqualTo("subject", "veh-1")), Nil, 100, "pit-7", None, keepAlive = "5m"))
    assert(req.path("pit").path("keep_alive").asText() === "5m")
    assert(req.path("pit").path("id").asText() === "pit-7")
    val wire = graft.sources.LiveWire.fromOptions(
      Map("pitKeepAlive" -> "90s").get(_))
    assert(wire.pitKeepAlive === "90s")
    // a typo must fail at option parse, not 400 every drain at runtime
    val e = intercept[IllegalArgumentException](
      graft.sources.LiveWire.fromOptions(Map("pitKeepAlive" -> "five minutes").get(_)))
    assert(e.getMessage.contains("pitKeepAlive"))
  }

  test("_msearch framing: empty header + single-line body per probe, newline-terminated") {
    // the NDJSON grammar the batched cut probe rides: each search is one
    // `{}` header line and ONE body line — a multi-line body would shear
    // the frame and the server would parse garbage
    val bodies = Seq(
      EsQueryDsl.timePercentilesRequest(
        Seq(EqualTo("subject", "a")), Seq(50.0)),
      EsQueryDsl.timePercentilesRequest(
        Seq(EqualTo("subject", "b")), Seq(25.0, 75.0)))
    bodies.foreach(b => assert(!b.contains("\n"), "bodies must be single-line JSON"))
    val frame = EsQueryDsl.msearchBody(bodies)
    val lines = frame.split("\n", -1)
    assert(frame.endsWith("\n"), "NDJSON is newline-terminated")
    assert(lines.length === 5 && lines(4).isEmpty, "2 probes = 4 lines + terminator")
    assert(lines(0) === "{}" && lines(2) === "{}", "headers are empty objects")
    val b0 = mapper.readTree(lines(1))
    assert(b0.path("size").asInt(-1) === 0 &&
      b0.path("aggs").has("time_cuts"), "slot 0 is its percentiles probe")
    assert(mapper.readTree(lines(3)).path("aggs").path("time_cuts")
      .path("percentiles").path("percents").size() === 2, "slot order is preserved")
  }

  test("pushdown-state round trip: the DSv2 scan's accepted filters translate") {
    // the same filter classes StatusScanBuilder accepts are the inputs here;
    // a subject-only scan emits just the match clause
    val got = mapper.readTree(
      EsQueryDsl.searchRequest(Seq(EqualTo("subject", "veh-9")), Nil, 100))
    val filterArr = got.path("query").path("bool").path("filter")
    assert(filterArr.size() === 1)
    assert(filterArr.get(0).path("match").path("subject").path("query").asText() === "veh-9")
  }
}
