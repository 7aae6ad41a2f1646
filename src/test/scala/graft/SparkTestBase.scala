package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the suite. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSessionHolder.spark

  /** Every node of an EXECUTED plan, descending through AQE wrappers and
    * query stages (whose `children` are Nil, so plain `collect` stops at
    * them).
    */
  def allExecNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => p +: allExecNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: allExecNodes(q.plan)
    case other => other +: other.children.flatMap(allExecNodes)
  }

  /** The executed BatchScanExec whose description contains `marker`. */
  def findScan(df: org.apache.spark.sql.DataFrame, marker: String): org.apache.spark.sql.execution.SparkPlan =
    allExecNodes(df.queryExecution.executedPlan).find(n =>
      n.getClass.getSimpleName == "BatchScanExec" && n.toString.contains(marker))
      .getOrElse(sys.error(s"no BatchScanExec matching '$marker' in executed plan"))
}

object SparkSessionHolder {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the bench/verify sessions run on the fork-free local FS (r18); the
    // whole spec suite runs through it too so any behavior drift from the
    // stock LocalFileSystem fails loudly here
    .config("spark.hadoop.fs.file.impl", classOf[graft.sources.NioLocalFileSystem].getName)
    .config("spark.hadoop.fs.AbstractFileSystem.file.impl", classOf[graft.sources.NioLocalFs].getName)
    .getOrCreate()
}
