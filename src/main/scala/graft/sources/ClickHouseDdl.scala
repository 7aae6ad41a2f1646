package graft.sources

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** ClickHouse DDL + JDBC dialect for the signal sink — the schema contract
  * of the reference's `signal` table (created by its goose migrations, run
  * at `internal/sync/test/sync_test.go:352`; consumed by
  * `internal/service/clickhouse/clickhouse.go:113-130`): a MergeTree table
  * `ORDER BY (token_id, timestamp)` with `UInt32` token ids,
  * millisecond-precision `DateTime64(3)` timestamps, and non-nullable
  * columns defaulting to `''` / `0`.
  *
  * Two pieces:
  *   - [[createTableDdl]] generates that DDL from a Spark schema, so the
  *     day a ClickHouse JDBC driver is allowed on the classpath,
  *     [[SignalSink.appendJdbc]] can be pointed at a table created to the
  *     reference's exact layout with zero code changes.
  *   - [[ClickHouseJdbcDialect]] teaches Spark's JDBC writer the ClickHouse
  *     type names and backtick quoting (the reference's sqlboiler dialect
  *     uses backtick quoting, `clickhouse.go:16-18`), so `df.write.jdbc`
  *     against a `jdbc:clickhouse:` url maps types correctly instead of
  *     falling back to ANSI defaults.
  */
object ClickHouseDdl {

  /** camelCase → snake_case: the Spark-side Signal columns (`tokenId`,
    * `valueNumber`, …) to the reference's ClickHouse column names
    * (`token_id`, `value_number`, … — `vss.TokenIDCol` etc. used at
    * `clickhouse.go:67-70,91`).
    */
  def snake(name: String): String =
    name.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase

  /** Spark type → ClickHouse type. `unsigned` lifts integer columns to
    * their UInt form (the reference scans token_id as uint32,
    * `clickhouse.go:103`); `lowCardinality` wraps dictionary-encoded
    * strings (the signal-name column: bounded vocabulary).
    */
  def chType(dt: DataType, unsigned: Boolean = false, lowCardinality: Boolean = false): String = dt match {
    case ByteType => if (unsigned) "UInt8" else "Int8"
    case ShortType => if (unsigned) "UInt16" else "Int16"
    case IntegerType => if (unsigned) "UInt32" else "Int32"
    case LongType => if (unsigned) "UInt64" else "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case BooleanType => "Bool"
    case StringType => if (lowCardinality) "LowCardinality(String)" else "String"
    case BinaryType => "String"
    case DateType => "Date32"
    case TimestampType => "DateTime64(3, 'UTC')" // ms precision — SURVEY §3 time contract
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(e, _) => s"Array(${chType(e)})"
    case other => throw new IllegalArgumentException(s"no ClickHouse mapping for $other")
  }

  /** Non-null column default in the reference's migrations: empty string
    * for strings, zero for everything else (ClickHouse columns are
    * non-nullable unless wrapped in Nullable — the sink never writes nulls).
    */
  def chDefault(dt: DataType): String = dt match {
    case StringType | BinaryType => "''"
    case ArrayType(_, _) => "[]"
    case _ => "0"
  }

  /** CREATE TABLE DDL for a Spark schema. Column order and names follow the
    * schema (camelCase mapped via [[snake]]); `orderBy` is the MergeTree
    * sorting key — (token_id, timestamp) for the signal table, which is
    * also exactly the access path every reference query uses
    * (`clickhouse.go:67-70`: filter token_id, order timestamp).
    */
  def createTableDdl(
      schema: StructType,
      table: String,
      orderBy: Seq[String],
      unsigned: Set[String] = Set.empty,
      lowCardinality: Set[String] = Set.empty,
      engine: String = "MergeTree"
  ): String = {
    val cols = schema.fields.map { f =>
      val name = snake(f.name)
      val t = chType(f.dataType, unsigned.contains(name), lowCardinality.contains(name))
      s"  `$name` $t DEFAULT ${chDefault(f.dataType)}"
    }
    val key = orderBy.map(c => s"`$c`").mkString("(", ", ", ")")
    s"""CREATE TABLE IF NOT EXISTS `$table` (
       |${cols.mkString(",\n")}
       |) ENGINE = $engine
       |ORDER BY $key""".stripMargin
  }

  /** The signal table exactly as the reference's migrations shape it. */
  def signalTableDdl(schema: StructType, table: String = "signal"): String =
    createTableDdl(
      schema,
      table,
      orderBy = Seq("token_id", "timestamp"),
      unsigned = Set("token_id"),
      lowCardinality = Set("name"))

  /** Spark JdbcDialect for `jdbc:clickhouse:` urls: ClickHouse type names on
    * write, backtick identifier quoting, no transactions (MergeTree inserts
    * are atomic per block, not transactional).
    */
  object ClickHouseJdbcDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:clickhouse:") || url.startsWith("jdbc:ch:")

    override def quoteIdentifier(colName: String): String = s"`$colName`"

    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType => Some(JdbcType("String", java.sql.Types.VARCHAR))
      case IntegerType => Some(JdbcType("Int32", java.sql.Types.INTEGER))
      case LongType => Some(JdbcType("Int64", java.sql.Types.BIGINT))
      case FloatType => Some(JdbcType("Float32", java.sql.Types.FLOAT))
      case DoubleType => Some(JdbcType("Float64", java.sql.Types.DOUBLE))
      case BooleanType => Some(JdbcType("Bool", java.sql.Types.BOOLEAN))
      case TimestampType => Some(JdbcType("DateTime64(3, 'UTC')", java.sql.Types.TIMESTAMP))
      case DateType => Some(JdbcType("Date32", java.sql.Types.DATE))
      case _ => None
    }

    override def isCascadingTruncateTable(): Option[Boolean] = Some(false)
  }

  /** Register the dialect with Spark's JDBC writer (idempotent). */
  def registerDialect(): Unit = {
    JdbcDialects.unregisterDialect(ClickHouseJdbcDialect)
    JdbcDialects.registerDialect(ClickHouseJdbcDialect)
  }
}
