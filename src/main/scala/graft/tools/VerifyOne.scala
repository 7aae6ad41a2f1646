package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump ONE declared query's result to parquet for a targeted oracle
  * compare: `runMain graft.tools.VerifyOne <name> <sfDir> <outDir>`.
  * Same session config as graft.Verify.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
