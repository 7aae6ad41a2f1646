package graft.sources

import java.io.{BufferedReader, File, FileReader}
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions, NamedReference, SortDirection, Transform, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
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
  private[sources] val ShardDir = """shard=(\d+)""".r
}

class ShardedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_sharded($path)"
  override def schema(): StructType = ShardedSignalSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardedScanBuilder(path)
}

/** One pushed aggregate: `min`/`max` over a source column, or `count_star`. */
case class ShardAggSpec(op: String, column: String)

/** Pushed GROUP BY + aggregate list. PARTIAL pushdown contract
  * (`supportCompletePushDown` stays false): each shard partition returns
  * one row per group with its shard-local min/max/count, and Spark's
  * retained final aggregate merges them (min→min, max→max, count→sum) —
  * the same split the reference gets from ClickHouse, which computes
  * `SELECT DISTINCT token_id` / `min(timestamp)` inside the store and
  * ships only the per-part results (clickhouse.go:65-110 [ext]).
  */
case class ShardPushedAgg(groupCols: Seq[String], aggs: Seq[ShardAggSpec]) {
  /** Scan output when pushed: group columns first, then agg columns, the
    * order `V2ScanRelationPushDown` zips its rewritten plan against.
    */
  def outputSchema: StructType = {
    val base = ShardedSignalSource.Schema
    def f(n: String) = base.fields.find(_.name == n).get
    StructType(
      groupCols.map(f) ++
        aggs.zipWithIndex.map {
          case (ShardAggSpec("count_star", _), i) =>
            StructField(s"agg_$i", LongType, nullable = false)
          case (ShardAggSpec(op, c), i) => StructField(s"agg_$i", f(c).dataType, nullable = true)
        })
  }
}

class ShardedScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownTopN {
  private var required: StructType = ShardedSignalSource.Schema
  private var pushedAgg: Option[ShardPushedAgg] = None
  private var topN: Int = -1
  private var topNDesc: Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (pushedAgg.isEmpty)
      required = StructType(ShardedSignalSource.Schema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

  private def refName(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      Some(nr.fieldNames()(0)).filter(n => ShardedSignalSource.Schema.fieldNames.contains(n))
    case _ => None
  }

  private def numeric(n: String): Boolean =
    ShardedSignalSource.Schema.fields.find(_.name == n).exists(f =>
      f.dataType == IntegerType || f.dataType == LongType || f.dataType == DoubleType)

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val groups = aggregation.groupByExpressions().toSeq.map(refName)
    if (groups.exists(_.isEmpty)) return false
    // When the grouping includes the clustering column, DECLINE: the
    // key-grouped layout already gives a zero-exchange COMPLETE
    // aggregation (ShardedSourceSpec), and Spark's pushed-agg rewrite
    // aliases the group columns (`shard AS group_col_0`), which breaks
    // KeyGroupedPartitioning propagation and re-introduces the shuffle —
    // pushed-partial + exchange loses to complete-without-exchange at any
    // scale.
    if (groups.flatten.contains("shard")) return false
    val aggs = aggregation.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(ShardAggSpec("count_star", ""))
      case m: Min => refName(m.column).filter(numeric).map(ShardAggSpec("min", _))
      case m: Max => refName(m.column).filter(numeric).map(ShardAggSpec("max", _))
      case _: AggregateFunc => None
    }
    if (aggs.exists(_.isEmpty)) return false
    pushedAgg = Some(ShardPushedAgg(groups.map(_.get), aggs.map(_.get)))
    true
  }

  /** TopN on `ts_us` (either direction), the reference's per-token
    * `ORDER BY timestamp LIMIT k` pushed into ClickHouse
    * (clickhouse.go:70-71 [ext]): each shard partition keeps a K-bounded
    * heap plus up to K null-ts rows (the null-ordering-safe superset —
    * StatusV2Source's contract), and Spark's retained global TakeOrdered
    * merges K rows per shard. Partial push only; never combined with a
    * pushed aggregation (Spark plans the sort above the final agg then).
    */
  override def pushTopN(orders: Array[V2SortOrder], l: Int): Boolean = {
    val onTs = pushedAgg.isEmpty && orders.length == 1 && (orders(0).expression() match {
      case nr: NamedReference => nr.fieldNames().length == 1 && nr.fieldNames()(0) == "ts_us"
      case _                  => false
    })
    if (onTs) {
      topN = l
      topNDesc = orders(0).direction() == SortDirection.DESCENDING
      true
    } else false
  }
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = pushedAgg match {
    case Some(pa) => new ShardedScan(path, pa.outputSchema, Some(pa))
    case None     => new ShardedScan(path, required, None, topN, topNDesc)
  }
}

class ShardedScan(path: String, required: StructType, pushedAgg: Option[ShardPushedAgg] = None,
    topN: Int = -1, topNDesc: Boolean = true)
    extends Scan with Batch with SupportsReportPartitioning with SupportsRuntimeFiltering {

  /** Runtime (DPP-style) filtering on the clustering column: when a join's
    * build side finishes, Spark hands the scan an IN-set of shard values
    * and re-plans input partitions — whole shard FILES are skipped before
    * a byte is read. At 100 TB this is partition pruning against the
    * MergeTree-style layout: a join against this month's active tokens
    * reads only the shards those tokens hash to.
    */
  @volatile private var runtimeShards: Option[Set[Int]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("shard"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("shard", vs) =>
      runtimeShards = Some(vs.collect { case n: Number => n.intValue() }.toSet)
    case EqualTo("shard", v: Number) => runtimeShards = Some(Set(v.intValue()))
    case _ => () // unsupported runtime filter: ignore (filters are advisory)
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-sharded $path key-grouped by shard" + pushedAgg.map(pa =>
      s" pushedAgg=[groups=${pa.groupCols.mkString(",")} " +
        s"aggs=${pa.aggs.map(a => s"${a.op}(${a.column})").mkString(",")}]").getOrElse("") +
      (if (topN >= 0) s" topN=$topN ts_us ${if (topNDesc) "DESC" else "ASC"}" else "")

  /** Two accepted layouts, one partition per SHARD in both:
    *   - flat `shard=K.csv` files (the hand-written fixture form)
    *   - `shard=K/` directories of part files — exactly what a Spark
    *     `write.partitionBy("shard")` job produces, so a pipeline can
    *     materialize the layout with a normal distributed write and read
    *     it back key-grouped. A shard's part files are read sequentially
    *     inside its one partition: the 1:1 partition↔key mapping is the
    *     invariant `KeyGroupedPartitioning` declares, the same unit a
    *     MergeTree shard is (clickhouse.go:67-70 [ext]).
    */
  private lazy val shardFiles: Array[(Int, Seq[File])] = {
    val entries = Option(new File(path).listFiles()).getOrElse(Array.empty)
    entries.flatMap { f =>
      f.getName match {
        case ShardedSignalSource.ShardFile(k) if f.isFile => Some(k.toInt -> Seq(f))
        case ShardedSignalSource.ShardDir(k) if f.isDirectory =>
          val parts = Option(f.listFiles()).getOrElse(Array.empty)
            .filter(p => p.isFile && !p.getName.startsWith(".") && !p.getName.startsWith("_"))
            .sortBy(_.getName).toSeq
          Some(k.toInt -> parts)
        case _ => None
      }
    }.sortBy(_._1)
  }

  override def planInputPartitions(): Array[InputPartition] =
    shardFiles
      .filter { case (shard, _) => runtimeShards.forall(_.contains(shard)) }
      .map { case (shard, fs) =>
        ShardPartition(fs.map(_.getAbsolutePath), shard): InputPartition
      }

  /** The contract that elides the shuffle: rows are clustered by the
    * identity of `shard`, in exactly `shardFiles.length` groups whose
    * values each [[ShardPartition.partitionKey]] announces. When a pushed
    * aggregation does NOT group by `shard`, the output no longer carries
    * the clustering column — report unknown partitioning rather than a
    * dangling reference.
    */
  override def outputPartitioning(): Partitioning =
    if (readSchema().fieldNames.contains("shard"))
      new KeyGroupedPartitioning(Array(Expressions.identity("shard")), shardFiles.length)
    else new UnknownPartitioning(shardFiles.length)

  override def createReaderFactory(): PartitionReaderFactory = pushedAgg match {
    case Some(pa) => new ShardedAggReaderFactory(pa)
    case None if topN >= 0 => new ShardedTopNReaderFactory(required, topN, topNDesc)
    case None => new ShardedReaderFactory(required)
  }
}

case class ShardPartition(files: Seq[String], shard: Int) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(shard)
}

class ShardedReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardPartition]
    new ShardedShardReader(p.files, p.shard, required)
  }
}

/** Chains one shard's part files through [[ShardedPartitionReader]]s. */
class ShardedShardReader(files: Seq[String], shard: Int, required: StructType)
    extends PartitionReader[InternalRow] {
  private val it = files.iterator
  private var cur: ShardedPartitionReader = _

  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!it.hasNext) return false
        cur = new ShardedPartitionReader(it.next(), shard, required)
      }
      if (cur.next()) return true
      cur.close(); cur = null
    }
    false
  }

  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) cur.close()
}

class ShardedTopNReaderFactory(required: StructType, topN: Int, topNDesc: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardPartition]
    new ShardedTopNReader(p.files, p.shard, required, topN, topNDesc)
  }
}

/** Per-shard pushed top-K on `ts_us`: ONE pass through the shard keeping a
  * K-bounded binary heap (desc keeps the K largest via a min-heap, asc the
  * K smallest via a max-heap) plus up to K null-ts rows — a correct
  * superset under either null ordering; the retained global TakeOrdered
  * above discards extras. Memory O(K), emitted rows ≤ 2K per shard.
  */
class ShardedTopNReader(files: Seq[String], shard: Int, required: StructType,
    topN: Int, topNDesc: Boolean)
    extends PartitionReader[InternalRow] {

  private val tsIdx = required.fieldIndex("ts_us")

  private lazy val out: java.util.ArrayDeque[InternalRow] = {
    val cmp: java.util.Comparator[(Long, InternalRow)] =
      if (topNDesc) java.util.Comparator.comparingLong((p: (Long, InternalRow)) => p._1)
      else java.util.Comparator.comparingLong((p: (Long, InternalRow)) => p._1).reversed()
    val heap = new java.util.PriorityQueue[(Long, InternalRow)](math.max(topN, 1), cmp)
    val res = new java.util.ArrayDeque[InternalRow]()
    var nNulls = 0
    val rows = new ShardedShardReader(files, shard, required)
    try {
      while (rows.next()) {
        val r = rows.get()
        if (r.isNullAt(tsIdx)) {
          if (nNulls < topN) { res.add(r); nNulls += 1 }
        } else {
          heap.add((r.getLong(tsIdx), r))
          if (heap.size() > topN) heap.poll()
        }
      }
    } finally rows.close()
    while (!heap.isEmpty) res.add(heap.poll()._2)
    res
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (out.isEmpty) false else { current = out.poll(); true }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class ShardedAggReaderFactory(pa: ShardPushedAgg) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardPartition]
    new ShardedAggReader(p.files, p.shard, pa)
  }
}

/** Shard-local hash aggregation for the pushed GROUP BY: one pass over the
  * shard's rows through the full-schema reader, one output row per group
  * holding (groupCols..., partial agg values...). State is bounded by the
  * shard's distinct group keys — for the reference's fragments (DISTINCT
  * token_id, per-token min ts) that is the per-shard token count, the same
  * bound the store's own aggregation carries.
  */
class ShardedAggReader(files: Seq[String], shard: Int, pa: ShardPushedAgg)
    extends PartitionReader[InternalRow] {

  private val base = ShardedSignalSource.Schema
  private val groupIdx = pa.groupCols.map(c => base.fieldIndex(c))
  private val aggIdx = pa.aggs.map(a => if (a.op == "count_star") -1 else base.fieldIndex(a.column))

  private lazy val resultIter: Iterator[InternalRow] = {
    val rows = new ShardedShardReader(files, shard, base)
    // group key → accumulator array (boxed; null = no value seen yet)
    val groups = new java.util.LinkedHashMap[Seq[Any], Array[Any]]()
    try {
      while (rows.next()) {
        val r = rows.get()
        val key = groupIdx.map(i => if (r.isNullAt(i)) null else r.get(i, base.fields(i).dataType))
        var acc = groups.get(key)
        if (acc == null) {
          acc = Array.fill[Any](pa.aggs.length)(null)
          pa.aggs.zipWithIndex.foreach { case (a, i) => if (a.op == "count_star") acc(i) = 0L }
          groups.put(key, acc)
        }
        pa.aggs.zipWithIndex.foreach { case (a, i) =>
          a.op match {
            case "count_star" => acc(i) = acc(i).asInstanceOf[Long] + 1L
            case "min" | "max" =>
              val ci = aggIdx(i)
              if (!r.isNullAt(ci)) {
                val v = r.get(ci, base.fields(ci).dataType)
                acc(i) =
                  if (acc(i) == null) v
                  else {
                    val cmp = (v, acc(i)) match {
                      case (a1: Int, b1: Int)       => java.lang.Integer.compare(a1, b1)
                      case (a1: Long, b1: Long)     => java.lang.Long.compare(a1, b1)
                      case (a1: Double, b1: Double) => java.lang.Double.compare(a1, b1)
                      case _ => 0
                    }
                    if ((a.op == "min") == (cmp < 0)) v else acc(i)
                  }
              }
          }
        }
      }
    } finally rows.close()
    import scala.jdk.CollectionConverters._
    groups.entrySet().iterator().asScala.map { e =>
      InternalRow.fromSeq((e.getKey ++ e.getValue).toIndexedSeq)
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (resultIter.hasNext) { current = resultIter.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
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
