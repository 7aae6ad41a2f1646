package graft

import java.nio.file.{Files, Path}

import graft.operators.Dedup
import graft.streaming.StreamingDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming incremental dedup over a real file source: waves arrive as
  * files, the query is STOPPED mid-stream and resumed (checkpoint + the
  * LATEST index pointer), and the union of pairs emitted over the
  * stream's life must equal the from-scratch batch dedup of the full
  * corpus — the losslessness invariant of wave-by-wave candidate
  * generation.
  */
class StreamingDedupSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Write one wave as a single NDJSON file into the watched dir. */
  private def deliver(wave: DataFrame, inDir: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-wave")
    wave.coalesce(1).write.mode("overwrite").json(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.startsWith("part-")).findFirst().get()
    Files.move(part, inDir.resolve(name))
  }

  test("streamed pairs across stop/resume equal the batch dedup of the full corpus") {
    val root = Files.createTempDirectory("graft-streamdedup")
    val inDir = Files.createDirectory(root.resolve("in"))
    val indexRoot = root.resolve("index").toString
    val pairsPath = root.resolve("pairs").toString
    val ckpt = root.resolve("ckpt").toString

    def stream() = StreamingDedup.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(inDir.toString),
      indexRoot, pairsPath, ckpt)

    // waves 1+2 arrive; stream consumes them and is stopped
    deliver(docs.where(pmod(col("doc_id"), lit(3)) === 0), inDir, "w1.json")
    deliver(docs.where(pmod(col("doc_id"), lit(3)) === 1), inDir, "w2.json")
    val q1 = stream()
    try q1.processAllAvailable() finally q1.stop()

    // wave 3 arrives while the stream is down; a fresh query resumes from
    // the checkpoint and the persisted index
    deliver(docs.where(pmod(col("doc_id"), lit(3)) === 2), inDir, "w3.json")
    val q2 = stream()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(pairsPath)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.minhashDedup(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty) // the corpus does contain near-dups

    // the published index covers the whole corpus exactly once
    val latest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(indexRoot, "LATEST")), "UTF-8").trim
    val (_, sets) = graft.jobs.DedupIndexJob.readIndex(spark, latest, "doc_id")
    assert(sets.count() === docs.count())
  }
}
