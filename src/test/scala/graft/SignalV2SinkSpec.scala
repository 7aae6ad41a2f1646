package graft

import java.nio.file.{Files, Paths}

import graft.sources.{SignalCommit, SignalDataWriter}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** The DSv2 batch sink's two-phase commit: rows round-trip exactly, the
  * success marker carries the true total, task abort leaves nothing
  * behind, and uncommitted temp files are invisible to readers.
  */
class SignalV2SinkSpec extends SparkTestBase {
  import spark.implicits._

  test("write -> part files + marker; rows round-trip through spark.read.json") {
    val dir = Files.createTempDirectory("graft-v2sink").toString
    val df = (1 to 1000).map(i => (i.toLong, s"sig_$i", i * 1.5, i % 2 == 0))
      .toDF("token_id", "name", "v", "flag")
      .repartition(7)
    df.write.format("graft-signal-sink").option("path", dir).mode("append").save()

    val marker = Paths.get(dir, "_GRAFT_SUCCESS")
    assert(Files.exists(marker), "job commit must publish the marker")
    val markerJson = new String(Files.readAllBytes(marker))
    assert(markerJson.contains("\"rows\":1000"), markerJson)

    val parts = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(parts.size === 7, s"one committed part per partition, got $parts")
    assert(!Files.list(Paths.get(dir, "_tmp")).iterator().asScala.exists(
      _.getFileName.toString.endsWith(".inprogress")),
      "no in-progress temp may survive the job")

    val back = spark.read.json(s"$dir/part-*.json")
    assert(back.count() === 1000)
    val got = back.select(col("token_id"), col("name"), col("v"), col("flag"))
      .as[(Long, String, Double, Boolean)].collect().sortBy(_._1)
    val want = (1 to 1000).map(i => (i.toLong, s"sig_$i", i * 1.5, i % 2 == 0))
    assert(got.toSeq === want)
  }

  test("special characters in strings survive the JSON escaping") {
    val dir = Files.createTempDirectory("graft-v2sink-esc").toString
    val tricky = "line\nbreak\ttab \"quote\" back\\slash ctl"
    Seq((1L, tricky)).toDF("id", "s")
      .coalesce(1)
      .write.format("graft-signal-sink").option("path", dir).mode("append").save()
    val back = spark.read.json(s"$dir/part-*.json").select("s").as[String].head()
    assert(back === tricky)
  }

  test("task abort deletes the temp file; nothing becomes visible") {
    val dir = Files.createTempDirectory("graft-v2sink-abort").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    val w = new SignalDataWriter(dir, schema, partitionId = 0, taskId = 42L)
    w.write(InternalRow(1L, UTF8String.fromString("doomed")))
    w.abort()
    val tmps = Files.list(Paths.get(dir, "_tmp")).iterator().asScala.toSeq
    assert(tmps.isEmpty, s"abort must remove temps, found $tmps")
    assert(!Files.list(Paths.get(dir)).iterator().asScala.exists(
      _.getFileName.toString.startsWith("part-")))
  }

  test("task commit is atomic: the part appears only after commit") {
    val dir = Files.createTempDirectory("graft-v2sink-commit").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    val w = new SignalDataWriter(dir, schema, partitionId = 3, taskId = 7L)
    w.write(InternalRow(5L))
    assert(!Files.list(Paths.get(dir)).iterator().asScala.exists(
      _.getFileName.toString.startsWith("part-")), "no part before commit")
    val msg = w.commit().asInstanceOf[SignalCommit]
    assert(msg.rows === 1L)
    assert(Files.exists(Paths.get(msg.file)))
  }

  test("unsupported column types fail loudly at the first row") {
    val dir = Files.createTempDirectory("graft-v2sink-bad").toString
    val ex = intercept[Exception] {
      Seq((1L, Seq(1, 2, 3))).toDF("id", "arr")
        .write.format("graft-signal-sink").option("path", dir).mode("append").save()
    }
    assert(ex.getMessage != null)
  }
}
