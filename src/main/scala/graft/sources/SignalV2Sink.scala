package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch SINK with a real two-phase commit — the write-side
  * twin of [[StatusV2Source]] and the offline stand-in for the reference's
  * ClickHouse batch insert (`internal/service/clickhouse/clickhouse.go:
  * 113-130`, prepared-batch append + commit). Rows stream out as NDJSON
  * part files:
  *
  *   - each task writes to `_tmp/part-<partition>-<task>.json.inprogress`
  *     and ATOMICALLY renames into place on task commit — a speculative
  *     or retried task that aborts deletes its temp and leaves nothing;
  *   - the driver's job commit writes `_GRAFT_SUCCESS` carrying the total
  *     row count from the per-task commit messages; job abort removes
  *     every committed part, so readers gating on the marker never see a
  *     half-written dataset.
  *
  * This is exactly the contract a 1000-executor append needs: task
  * idempotence under retry, no cross-task coordination until the single
  * driver-side commit, and a published atomic success marker.
  *
  * `df.write.format("graft-signal-sink").option("path", dir).save()`
  */
class SignalV2Sink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-signal-sink"

  // write-only source: schema comes from the DataFrame being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = new StructType()

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new SignalSinkTable(properties.get("path"), schema)
}

class SignalSinkTable(path: String, writeSchema: StructType) extends Table with SupportsWrite {
  override def name(): String = s"graft_signal_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new SignalBatchWrite(path, info.schema())
    }
  }
}

/** One part file per task; message carries (file, rows) to the driver. */
case class SignalCommit(file: String, rows: Long) extends WriterCommitMessage

class SignalBatchWrite(path: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SignalWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val total = messages.map(_.asInstanceOf[SignalCommit].rows).sum
    val marker = Paths.get(path, "_GRAFT_SUCCESS")
    val tmp = Paths.get(path, "_GRAFT_SUCCESS.inprogress")
    Files.createDirectories(Paths.get(path))
    Files.write(tmp, s"""{"rows":$total,"parts":${messages.length}}""".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, marker, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case SignalCommit(file, _) => Files.deleteIfExists(Paths.get(file))
      case _                     => ()
    }
}

class SignalWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SignalDataWriter(path, schema, partitionId, taskId)
}

/** NDJSON writer with temp-then-rename task commit. Field rendering covers
  * the signal schema's types (and the common scalars) explicitly — an
  * unsupported type fails loudly at the first row, not silently as null.
  */
class SignalDataWriter(path: String, schema: StructType, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val tmp: Path = Paths.get(path, "_tmp", f"part-$partitionId%05d-$taskId.json.inprogress")
  Files.createDirectories(tmp.getParent)
  private val out = new BufferedWriter(new OutputStreamWriter(
    Files.newOutputStream(tmp), StandardCharsets.UTF_8))
  private var rows = 0L

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder("{")
    var first = true
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!first) sb.append(',')
      first = false
      sb.append('"').append(f.name).append("\":")
      if (row.isNullAt(i)) sb.append("null")
      else f.dataType match {
        case StringType    => sb.append('"').append(jsonEscape(row.getUTF8String(i).toString)).append('"')
        case LongType      => sb.append(row.getLong(i))
        case IntegerType   => sb.append(row.getInt(i))
        case DoubleType    => sb.append(row.getDouble(i))
        case BooleanType   => sb.append(row.getBoolean(i))
        case TimestampType => sb.append(row.getLong(i)) // epoch micros, lossless
        case other => throw new IllegalArgumentException(
          s"SignalV2Sink does not render $other (field ${f.name}); extend the writer")
      }
    }
    sb.append('}')
    out.write(sb.toString)
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val dest = Paths.get(path, f"part-$partitionId%05d-$taskId.json")
    Files.createDirectories(dest.getParent)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    SignalCommit(dest.toString, rows)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tmp)
  }

  override def close(): Unit = ()
}
