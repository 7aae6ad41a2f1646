package graft

import java.nio.file.{Files, Path}

import graft.streaming.StreamingGates
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming parity for the two model-based curation gates (r7 verdict
  * Next #7): the frozen model (classifier weights, bigram LM, tercile
  * boundaries) is published batch-side, documents arrive in waves over a
  * file stream, the query is stopped mid-stream and resumed from its
  * checkpoint, and the union of emitted per-doc rows must equal the
  * DECLARED q191 scores/keeps and q192 tiers on the same corpus.
  */
class StreamingGatesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def deliver(wave: DataFrame, inDir: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-gatewave")
    wave.coalesce(1).write.mode("overwrite").json(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.startsWith("part-")).findFirst().get()
    Files.move(part, inDir.resolve(name))
  }

  test("streamed gate rows across stop/resume equal the declared q191/q192 outputs") {
    val root = Files.createTempDirectory("graft-streamgates")
    val inDir = Files.createDirectory(root.resolve("in"))
    val outPath = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    val model = StreamingGates.train(docs)

    def stream() = StreamingGates.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(inDir.toString),
      model, outPath, ckpt)

    // waves 1+2 arrive; the stream consumes them and is stopped
    deliver(docs.where(pmod(col("doc_id"), lit(3)) === 0), inDir, "w1.json")
    deliver(docs.where(pmod(col("doc_id"), lit(3)) === 1), inDir, "w2.json")
    val q1 = stream()
    try q1.processAllAvailable() finally q1.stop()

    // wave 3 arrives while the stream is down; resume from the checkpoint
    deliver(docs.where(pmod(col("doc_id"), lit(3)) === 2), inDir, "w3.json")
    val q2 = stream()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(outPath)

    // classifier parity: (doc_id, n_tokens, score_ppm, keep) ≡ q191
    val gotCls = streamed.select("doc_id", "n_tokens", "score_ppm", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val expCls = SparkEntry.queries("q191_quality_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(gotCls === expCls, "streamed classifier rows must equal the declared q191")

    // perplexity-gate parity: (doc_id, fluency_ppm, tier) ≡ q192 for every
    // scored doc; unscored (<2-token) docs are null-tier in the stream and
    // absent from q192
    val gotTier = streamed.where(col("tier").isNotNull)
      .select("doc_id", "fluency_ppm", "tier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expTier = SparkEntry.queries("q192_perplexity_gate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(gotTier === expTier, "streamed tiers must equal the declared q192")
    assert(gotTier.nonEmpty && gotCls.size >= gotTier.size)

    // no doc scored twice across the stop/resume (checkpoint exactness)
    assert(streamed.groupBy("doc_id").count().where(col("count") > 1).count() === 0)
  }
}
