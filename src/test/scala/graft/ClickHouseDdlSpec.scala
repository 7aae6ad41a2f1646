package graft

import graft.sources.ClickHouseDdl
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** The ClickHouse schema contract of the reference's signal table
  * (`internal/service/clickhouse/clickhouse.go:113-130`; DDL created by its
  * migrations at `internal/sync/test/sync_test.go:352`): MergeTree ordered
  * by (token_id, timestamp), UInt32 token ids, DateTime64(3) timestamps,
  * non-null defaults.
  */
class ClickHouseDdlSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val signalSchema = StructType(Seq(
    StructField("tokenId", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("name", StringType),
    StructField("valueNumber", DoubleType),
    StructField("valueString", StringType),
    StructField("source", StringType)))

  test("signal DDL matches the reference migration shape") {
    val ddl = ClickHouseDdl.signalTableDdl(signalSchema)
    assert(ddl ===
      """CREATE TABLE IF NOT EXISTS `signal` (
        |  `token_id` UInt32 DEFAULT 0,
        |  `timestamp` DateTime64(3, 'UTC') DEFAULT 0,
        |  `name` LowCardinality(String) DEFAULT '',
        |  `value_number` Float64 DEFAULT 0,
        |  `value_string` String DEFAULT '',
        |  `source` String DEFAULT ''
        |) ENGINE = MergeTree
        |ORDER BY (`token_id`, `timestamp`)""".stripMargin)
  }

  test("type mapping covers the full signal surface plus common extensions") {
    import ClickHouseDdl.chType
    assert(chType(IntegerType, unsigned = true) === "UInt32")
    assert(chType(IntegerType) === "Int32")
    assert(chType(LongType) === "Int64")
    assert(chType(TimestampType) === "DateTime64(3, 'UTC')")
    assert(chType(DoubleType) === "Float64")
    assert(chType(FloatType) === "Float32")
    assert(chType(StringType) === "String")
    assert(chType(StringType, lowCardinality = true) === "LowCardinality(String)")
    assert(chType(DateType) === "Date32")
    assert(chType(ArrayType(DoubleType)) === "Array(Float64)")
    assert(chType(DecimalType(18, 4)) === "Decimal(18, 4)")
  }

  test("snake-case mapping matches the reference column constants") {
    // vss.TokenIDCol / TimestampCol / NameCol as used at clickhouse.go:67-70,91
    assert(ClickHouseDdl.snake("tokenId") === "token_id")
    assert(ClickHouseDdl.snake("valueNumber") === "value_number")
    assert(ClickHouseDdl.snake("timestamp") === "timestamp")
    assert(ClickHouseDdl.snake("name") === "name")
  }

  test("JDBC dialect resolves for clickhouse urls and maps write types") {
    ClickHouseDdl.registerDialect()
    val d = JdbcDialects.get("jdbc:clickhouse://example:8123/db")
    assert(d.quoteIdentifier("name") === "`name`")
    assert(d.getJDBCType(TimestampType).get.databaseTypeDefinition === "DateTime64(3, 'UTC')")
    assert(d.getJDBCType(IntegerType).get.databaseTypeDefinition === "Int32")
    assert(d.getJDBCType(DoubleType).get.databaseTypeDefinition === "Float64")
    assert(d.isCascadingTruncateTable() === Some(false))
    // a non-clickhouse url must NOT pick up the dialect
    val derby = JdbcDialects.get("jdbc:derby:memory:x")
    assert(derby.quoteIdentifier("name") !== "`name`")
  }
}
