package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB as the
  * correctness oracle. Keeping both halves in one value is what guarantees
  * the column names/aliases stay in lockstep — the driver's compare hashes
  * columns by name (builder contract).
  */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
