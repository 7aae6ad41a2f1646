package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared capability lives in a [[graft.queries.QueryDef]] inside
  * one of the query modules; this object just assembles the maps the driver
  * consumes.
  */
object SparkEntry {

  /** All declared capabilities. Order: reference-surface relational ops
    * first, then the LLM-pipeline extensions.
    */
  def allDefs: Seq[QueryDef] = moduleDefs.flatMap(_._2)

  /** Capabilities grouped by module, in declaration order. The bench runs
    * module-by-module (cheap relational analytics first, the cache-sharing
    * dedup/similarity families last and contiguous) and clears the Spark
    * cache between modules (`Bench.scala`): within-module subtree sharing,
    * bounded cross-module footprint.
    */
  def moduleDefs: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> Relational.defs,
    "relational2" -> Relational2Queries.defs,
    "sharded" -> ShardedQueries.defs,
    "live" -> LiveQueries.defs,
    "analytics" -> Analytics.defs,
    "analytics2" -> Analytics2.defs,
    "analytics3" -> Analytics3.defs,
    "analytics4" -> Analytics4.defs,
    "analytics5" -> Analytics5.defs,
    "stats" -> StatQueries.defs,
    "pipeline3" -> Pipeline3Queries.defs,
    "diagnostics" -> DiagnosticsQueries.defs,
    "pipeline4" -> Pipeline4Queries.defs,
    "text" -> TextQueries.defs,
    "pipeline" -> PipelineQueries.defs,
    "pipeline2" -> Pipeline2Queries.defs,
    "dedup" -> DedupQueries.defs,
    "similarity" -> SimilarityQueries.defs,
    "multimodal" -> MultimodalQueries.defs
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The engine's core operator: document→EAV signal explosion.
    */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "q11_signal_explode").get.spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
