package graft.ops

import graft.schema.{SignalDefinition, SignalDefinitions, ValueKind}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document→rows conversion: each status document becomes 0..N EAV signal
  * rows. This is the engine's core compute operator, replacing the
  * reference's hand-written per-doc Go loop
  * (`internal/sync/sync.go:187-208`, `convertToClickhouseSignals` calling
  * model-garage `convert.SignalsFromPayload`).
  *
  * Spark-first design: instead of a row-at-a-time flatMap, the conversion is
  * a pure Column program — `from_json` on the open-ended payload, one struct
  * per registry definition, `explode` of the struct array, then a null
  * filter. Everything stays inside whole-stage codegen and Catalyst can
  * prune/push freely. Bad documents (reference `sync.go:193-203`: conversion
  * error ⇒ skip doc, batch survives) degrade to zero emitted rows because
  * `from_json` is permissive: absent/mistyped fields parse as null and are
  * dropped by the per-signal presence filter.
  */
object SignalExplode {

  /** JSON schema for the payload restricted to the fields a definition set
    * needs — mirrors the reference's `_source.includes` pruning
    * (`internal/service/elastic/elastic.go:67-77`): we never materialize
    * payload fields no signal wants.
    *
    * Numeric signals parse as DoubleType (JSON numbers; ES float/long both
    * upcast losslessly), string signals as StringType. Dotted original
    * names (e.g. `wifi.status`) become nested structs.
    */
  def payloadSchema(defs: Seq[SignalDefinition]): StructType = {
    // Group by head path segment to build nested structs one level at a time.
    def build(paths: Seq[(List[String], DataType)]): StructType =
      StructType(
        paths
          .groupBy(_._1.head)
          .toSeq
          .sortBy(_._1)
          .map { case (head, group) =>
            val leaves = group.filter(_._1.lengthIs == 1)
            if (leaves.nonEmpty) StructField(head, leaves.head._2, nullable = true)
            else StructField(head, build(group.map { case (p, t) => (p.tail, t) }), nullable = true)
          }
      )
    build(defs.map { d =>
      val t: DataType =
        if (d.kind == ValueKind.Number) DoubleType else StringType
      (d.originalName.split('.').toList, t)
    })
  }

  private def signalStruct(payload: Column, d: SignalDefinition): Column = {
    val raw = d.originalName.split('.').foldLeft(payload)(_.getField(_))
    val (num, str) = d.kind match {
      case ValueKind.Number =>
        (raw.cast(DoubleType) * lit(d.scale), lit(""))
      case ValueKind.Str =>
        (lit(0.0), raw.cast(StringType))
    }
    struct(
      lit(d.vssName).as("name"),
      coalesce(num, lit(0.0)).as("valueNumber"),
      coalesce(str, lit("")).as("valueString"),
      raw.isNotNull.as("present")
    )
  }

  /** Explode status envelopes into signal rows.
    *
    * Input columns required: `subject`, `source`, `time` (timestamp), and
    * `data` — either a raw JSON string (preferred: schema drift can never
    * fail the scan) or an already-nested struct.
    *
    * Output columns: `subject, timestamp, name, valueNumber, valueString,
    * source` — tokenId is attached afterwards by the dimension join
    * ([[DeviceDim]]), keeping this operator shuffle-free and narrow.
    */
  def explodeSignals(
      docs: DataFrame,
      defs: Seq[SignalDefinition] = SignalDefinitions.all
  ): DataFrame = {
    require(defs.nonEmpty, "signal definition set must not be empty")
    // Stage the payload parse as its own projection: every signal struct
    // reads the SAME parsed struct attribute. Inlining from_json into the
    // signal array would re-parse the JSON once per definition per row.
    val staged =
      if (docs.schema("data").dataType == StringType)
        docs.withColumn("data", from_json(col("data"), payloadSchema(defs)))
      else docs
    finishExplode(staged, docs.columns.contains("tokenId"),
      array(defs.map(d => signalStruct(col("data"), d)): _*))
  }

  /** Versioned-payload dispatch: each document is converted by the
    * definition table its payload version selects — the reference's
    * try-v2-then-fall-back-to-v1 logic (`internal/sync/sync.go:187-208`)
    * as one declarative Column program instead of a per-row error path.
    *
    * `version` evaluates to a key of `byVersion` ("1"/"2"); documents
    * whose version matches no table produce a NULL signal array, which
    * `explode` drops — the skip-doc-keep-batch semantics of the
    * reference's conversion-error branch. Each row parses its payload at
    * most ONCE: the per-version `from_json` projections are guarded by
    * `when(version === v)`, so codegen only executes the taken branch.
    *
    * Requires `data` as a raw JSON string (version dispatch over an
    * already-typed struct would need one input schema per version).
    */
  def explodeSignalsVersioned(
      docs: DataFrame,
      byVersion: Map[String, Seq[SignalDefinition]] = SignalDefinitions.byVersion,
      version: Option[Column] = None
  ): DataFrame = {
    require(byVersion.nonEmpty, "version dispatch table must not be empty")
    require(docs.schema("data").dataType == StringType,
      "versioned dispatch requires the raw JSON payload string")
    val ver = version.getOrElse {
      if (docs.columns.contains("dataschema")) SignalDefinitions.versionOf(col("dataschema"))
      else lit("1")
    }
    val versions = byVersion.toSeq.sortBy(_._1)
    val staged = versions.foldLeft(docs.withColumn("__ver", ver)) {
      case (df, (v, defs)) =>
        df.withColumn(
          s"__data_$v",
          when(col("__ver") === v, from_json(col("data"), payloadSchema(defs))))
    }
    val sigs = versions
      .map { case (v, defs) =>
        (v, array(defs.map(d => signalStruct(col(s"__data_$v"), d)): _*))
      }
      .foldLeft(lit(null).cast(
        ArrayType(StructType(Seq(
          StructField("name", StringType, nullable = false),
          StructField("valueNumber", DoubleType),
          StructField("valueString", StringType),
          StructField("present", BooleanType)
        )))): Column) { case (rest, (v, arr)) => when(col("__ver") === v, arr).otherwise(rest) }
    finishExplode(staged, docs.columns.contains("tokenId"), sigs)
  }

  /** Shared tail: explode the per-doc signal array, drop absent signals,
    * and project the sink row shape.
    */
  private def finishExplode(staged: DataFrame, hasTokenId: Boolean, sigs: Column): DataFrame = {
    // tokenId passes through when the dim join already ran upstream.
    val keyCols =
      if (hasTokenId) Seq(col("tokenId"), col("subject"))
      else Seq(col("subject"))
    staged
      .select(
        keyCols ++ Seq(
          col("time").as("timestamp"),
          col("source"),
          explode(sigs).as("sig")
        ): _*
      )
      .where(col("sig.present"))
      .select(
        keyCols ++ Seq(
          col("timestamp"),
          col("sig.name").as("name"),
          col("sig.valueNumber").as("valueNumber"),
          col("sig.valueString").as("valueString"),
          col("source")
        ): _*
      )
  }
}
