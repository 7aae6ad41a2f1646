package graft.sources

import java.time.Instant
import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThanOrEqual, IsNotNull, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 status-document source with REAL pushdown — the offline
  * stand-in for the reference's Elasticsearch index scan
  * (`internal/service/elastic/elastic.go:46-108`), which pushes subject
  * equality, a half-open time range, projection, and a page limit into the
  * store. This source accepts exactly those pushdowns over NDJSON files:
  *
  *   - `subject = 'x'`  → evaluated during the raw scan (match filter)
  *   - `time >= a` / `time < b` → evaluated on the parsed event time
  *   - column pruning → only requested envelope fields are materialized;
  *     in particular the (large) `data` payload string is never built
  *     unless asked for (`_source.includes` analog, elastic.go:67-77)
  *   - limit → per-partition early termination (`size`, elastic.go:58)
  *
  * `spark.read.format("graft-status").load(dir)`; `.explain` shows the
  * accepted filters under `PushedFilters`. One InputPartition per file —
  * the unit a 1000-executor cluster parallelizes over.
  */
class StatusV2Source extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-status"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = StatusV2Source.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new StatusTable(properties.get("path"))
}

object StatusV2Source {
  /** Envelope + raw payload: the 6 always-fetched `_source` fields of the
    * reference plus `data` as an unparsed JSON string.
    */
  val Schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("subject", StringType),
    StructField("source", StringType),
    StructField("specversion", StringType),
    StructField("time", TimestampType),
    StructField("dataschema", StringType),
    StructField("data", StringType)
  ))
}

class StatusTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_status($path)"
  override def schema(): StructType = StatusV2Source.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StatusScanBuilder(path)
}

class StatusScanBuilder(path: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = StatusV2Source.Schema
  private var limit: Int = -1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("subject", _: String) => true
      case GreaterThanOrEqual("time", _) => true
      case LessThan("time", _)           => true
      case IsNotNull("subject" | "time") => true
      case _                             => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Per-partition early stop only — Spark must keep its own global Limit
  // above the scan (a false here would let the planner drop it and return
  // up to limit×partitions rows).
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = new StatusScan(path, pushed, required, limit)
}

class StatusScan(path: String, filters: Array[Filter], required: StructType, limit: Int)
    extends Scan
    with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"graft-status path=$path pushed=[${filters.mkString(", ")}] limit=$limit"

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(x => x.isFile && !x.getName.startsWith(".")).map(_.getPath).sorted
      else Array(path)
    files.map(p => StatusFilePartition(p): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StatusReaderFactory(filters, required, limit)

  // Observability: malformed-line skips are a first-class metric (the
  // reference only logs them, sync.go:193-203), surfaced per-scan in the
  // SQL UI / metrics sink.
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new SkippedLinesMetric)
}

class SkippedLinesMetric extends CustomSumMetric {
  override def name(): String = "skippedLines"
  override def description(): String = "malformed status lines skipped"
}

case class SkippedLinesTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "skippedLines"
}

case class StatusFilePartition(path: String) extends InputPartition

class StatusReaderFactory(filters: Array[Filter], required: StructType, limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new StatusPartitionReader(partition.asInstanceOf[StatusFilePartition].path, filters, required, limit)
}

/** Line-by-line NDJSON reader evaluating the pushed predicates natively
  * (the "store side" of the pushdown) and materializing only required
  * columns. Malformed lines are skipped — the reference's bad-document
  * tolerance (`sync.go:193-203`).
  */
class StatusPartitionReader(path: String, filters: Array[Filter], required: StructType, limit: Int)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
  private val it = lines.getLines()
  private var current: InternalRow = _
  private var emitted = 0
  private var skipped = 0L

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(SkippedLinesTaskMetric(skipped))

  private val subjectEq: Option[String] = filters.collectFirst { case EqualTo("subject", v: String) => v }
  private def tsMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case i: Instant            => i.getEpochSecond * 1000000L + i.getNano / 1000
    case other                 => throw new IllegalArgumentException(s"unsupported time literal: $other")
  }
  private val timeGte: Option[Long] = filters.collectFirst { case GreaterThanOrEqual("time", v) => tsMicros(v) }
  private val timeLt: Option[Long] = filters.collectFirst { case LessThan("time", v) => tsMicros(v) }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (it.hasNext) {
      val line = it.next()
      if (line.nonEmpty) {
        try {
          val node = mapper.readTree(line)
          if (node == null || !node.isObject) skipped += 1
          else {
            val subject = Option(node.get("subject")).filter(_.isTextual).map(_.asText())
            val timeUs = Option(node.get("time")).filter(_.isTextual).flatMap { t =>
              try {
                val i = Instant.parse(t.asText())
                Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
              } catch { case _: Exception => None }
            }
            val pass =
              subjectEq.forall(s => subject.contains(s)) &&
                timeGte.forall(g => timeUs.exists(_ >= g)) &&
                timeLt.forall(l => timeUs.exists(_ < l))
            if (pass) {
              val values = required.fields.map { f =>
                f.name match {
                  case "time" => timeUs.map(Long.box).orNull
                  case "data" =>
                    Option(node.get("data")).map(d => UTF8String.fromString(d.toString)).orNull
                  case other =>
                    Option(node.get(other)).filter(_.isTextual)
                      .map(v => UTF8String.fromString(v.asText())).orNull
                }
              }
              current = InternalRow.fromSeq(values.toIndexedSeq)
              emitted += 1
              return true
            }
          }
        } catch { case _: Exception => skipped += 1 } // malformed line ⇒ skip + count
      }
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = lines.close()
}
