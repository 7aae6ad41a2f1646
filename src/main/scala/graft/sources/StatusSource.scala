package graft.sources

import graft.ops.SignalExplode
import graft.schema.{SignalDefinition, SignalDefinitions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Bounded source of status documents.
  *
  * The reference scans an Elasticsearch index page-by-page with pushed-down
  * filter/sort/limit/projection (`internal/service/elastic/elastic.go:
  * 46-108`). Our engine treats the status store as any bounded Spark source
  * behind one explicit schema: in production the elasticsearch-spark
  * connector (same pushdown, connector-managed scroll paging replaces the
  * hand-rolled cursor loop); offline/tests, JSON files. Reading with an
  * explicit `StructType` — never inference — keeps the scan deterministic
  * and lets Catalyst prune the payload to exactly the fields the signal
  * registry needs, the analog of `_source.includes` (`elastic.go:67-77`).
  */
object StatusSource {

  /** Envelope fields always fetched — the 6 fixed `_source.includes` of
    * `elastic.go:69-70` (id, subject, source, specversion, time,
    * dataschema) plus `location`, the index's `geo_point` field
    * (`status_mapping.json:801-804`). Spark has no geo type, so the
    * declared mapping (SURVEY §1.2) is a lat/lon double struct; the wire
    * carries the coordinates as STRINGS, so the schema reads them as such
    * and [[readJson]] casts — a failed cast nulls the coordinate, which is
    * exactly ES `ignore_malformed: true`.
    */
  def envelopeFields: Seq[StructField] = Seq(
    StructField("id", StringType),
    StructField("subject", StringType),
    StructField("source", StringType),
    StructField("specversion", StringType),
    StructField("time", TimestampType),
    StructField("dataschema", StringType),
    StructField("type", StringType), // CloudEvents type, in `_source.includes` (elastic.go:70)
    StructField("location", StructType(Seq(
      StructField("lat", StringType),
      StructField("lon", StringType))))
  )

  def docSchema(defs: Seq[SignalDefinition]): StructType =
    StructType(envelopeFields :+ StructField("data", SignalExplode.payloadSchema(defs)))

  /** Read a JSON file/dir of status docs (objects or arrays of objects).
    * PERMISSIVE mode: malformed docs yield null fields and convert to zero
    * signals rather than failing the job (reference `sync.go:193-203`).
    * `location` is exposed as `struct<lat double, lon double>` with
    * malformed coordinates nulled (ES `ignore_malformed` semantics).
    */
  def readJson(
      spark: SparkSession,
      path: String,
      defs: Seq[SignalDefinition] = SignalDefinitions.all,
      multiLine: Boolean = true
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .schema(docSchema(defs))
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .json(path)
      .withColumn("location",
        when(col("location").isNotNull,
          struct(
            col("location.lat").cast(DoubleType).as("lat"),
            col("location.lon").cast(DoubleType).as("lon"))))
  }
}
