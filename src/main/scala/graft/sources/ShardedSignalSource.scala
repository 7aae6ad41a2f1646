package graft.sources

import java.io.{BufferedReader, File, FileReader}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned DSv2 source: the 100 TB shuffle-elision seam.
  *
  * The dataset layout is one file per SHARD (`shard=K.csv`, rows
  * `token_id,ts_us,name,v`), the layout a production signal store keeps
  * when it hash-buckets by device: the reference's ClickHouse table is
  * MergeTree `ORDER BY (token_id, timestamp)` (sync_test.go:352 [ext]) —
  * data arrives already clustered by key. A plain source throws that
  * clustering away and every per-key aggregation pays a full shuffle of
  * the corpus. This source KEEPS it: each input partition announces its
  * shard value (`HasPartitionKey`) and the scan reports
  * `KeyGroupedPartitioning(identity(shard))`, so Catalyst knows rows of
  * one shard are co-located. With `spark.sql.sources.v2.bucketing.enabled`
  * a `groupBy(shard, token_id)` aggregates with ZERO exchange, and two
  * datasets in the same layout storage-partition-join without either side
  * shuffling — at 100 TB that is the difference between an all-corpus
  * network pass per query and none.
  *
  * The CSV-line format is deliberately minimal: the point of the file is
  * the PARTITIONING metadata path, which is format-independent (the
  * production twin reads the same way from bucketed parquet/MergeTree
  * parts).
  */
class ShardedSignalSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-sharded"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ShardedSignalSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new ShardedTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ShardedSignalSource {
  val Schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private[sources] val ShardFile = """shard=(\d+)\.csv""".r
}

class ShardedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_sharded($path)"
  override def schema(): StructType = ShardedSignalSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardedScanBuilder(path)
}

class ShardedScanBuilder(path: String) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ShardedSignalSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(ShardedSignalSource.Schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ShardedScan(path, required)
}

class ShardedScan(path: String, required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-sharded $path key-grouped by shard"

  private lazy val shardFiles: Array[(Int, File)] = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
    files.flatMap { f =>
      f.getName match {
        case ShardedSignalSource.ShardFile(k) => Some(k.toInt -> f)
        case _ => None
      }
    }.sortBy(_._1)
  }

  override def planInputPartitions(): Array[InputPartition] =
    shardFiles.map { case (shard, f) => ShardPartition(f.getAbsolutePath, shard) }

  /** The contract that elides the shuffle: rows are clustered by the
    * identity of `shard`, in exactly `shardFiles.length` groups whose
    * values each [[ShardPartition.partitionKey]] announces.
    */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("shard")), shardFiles.length)

  override def createReaderFactory(): PartitionReaderFactory = new ShardedReaderFactory(required)
}

case class ShardPartition(file: String, shard: Int) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(shard)
}

class ShardedReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardPartition]
    new ShardedPartitionReader(p.file, p.shard, required)
  }
}

/** Reads one shard file; projects only the pruned columns.
  *
  * Error contract (ADVICE r5): a structurally malformed row (wrong field
  * count, non-numeric token/ts/v) fails the task with the FILE and LINE
  * CONTENT in the message — silent drops hide corrupt shards and a raw
  * NumberFormatException gives no locus at 100 TB. An EMPTY numeric field
  * maps to null, honoring the nullable schema (the "signal present but
  * value missing" row a real store produces).
  */
class ShardedPartitionReader(file: String, shard: Int, required: StructType)
    extends PartitionReader[InternalRow] {
  private val in = new BufferedReader(new FileReader(file))
  private var current: InternalRow = _
  private var lineNo: Long = 0L

  private def bad(line: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"malformed sharded-signal row ($why) at $file:$lineNo: '$line'")

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      lineNo += 1
      if (line.nonEmpty) {
        val parts = line.split(",", -1)
        if (parts.length != 4) bad(line, s"expected 4 fields, got ${parts.length}")
        def longOrNull(s: String, field: String): Any =
          if (s.isEmpty) null
          else try java.lang.Long.valueOf(s.toLong)
          catch { case _: NumberFormatException => bad(line, s"non-numeric $field") }
        def doubleOrNull(s: String, field: String): Any =
          if (s.isEmpty) null
          else try java.lang.Double.valueOf(s.toDouble)
          catch { case _: NumberFormatException => bad(line, s"non-numeric $field") }
        current = InternalRow.fromSeq(required.fields.toIndexedSeq.map { f =>
          f.name match {
            case "shard" => shard
            case "token_id" => longOrNull(parts(0), "token_id")
            case "ts_us" => longOrNull(parts(1), "ts_us")
            case "name" => UTF8String.fromString(parts(2))
            case "v" => doubleOrNull(parts(3), "v")
          }
        })
        return true
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
