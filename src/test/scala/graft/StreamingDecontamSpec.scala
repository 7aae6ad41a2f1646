package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming parity for semantic decontamination (r9 verdict Next #7): the
  * q204 pass run INCREMENTALLY — frozen centroids, the static test/benchmark
  * slice joined against train-side micro-batches — must produce exactly the
  * batch result. This is the shape a continuous ingestion pipeline runs:
  * the eval suite is fixed, new train documents arrive forever, and each
  * batch's verdicts are final because a train vector's evidence
  * (n_hits/max_cos over the TEST side) is complete the moment it is scored.
  */
class StreamingDecontamSpec extends SparkTestBase {

  private def vec(i: Long): Seq[Double] =
    Seq.tabulate(8)(j => math.sin(i * 0.37 + j * 0.91) + (if (i % 10 == 0) 0.25 else 0.0))

  test("streamed train batches reproduce the batch semantic-decontamination verdicts exactly") {
    import spark.implicits._

    val all = (0L until 240L).map(i => (i, vec(i)))
    val staticDf = all.toDF("vec_id", "embedding")
    val corpus = Similarity.prepare(staticDf, "vec_id", "embedding")
    val centroids = corpus.where(col("vid") < 8)
    val isTest = col("vid") % 10 === 0

    val want = Similarity.semanticContamination(corpus, centroids, isTest, 0.4, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "fixture must produce contaminated train vectors")

    // frozen artifacts: the benchmark slice and the coarse quantizer never
    // change while train data streams
    val testRows = all.filter(_._1 % 10 == 0)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // one batch = newly arrived TRAIN vectors; union the frozen test
        // slice so the cross-set bucketed join sees both sides
        val combined = batch.sparkSession.createDataFrame(
          batch.collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1))) ++ testRows)
          .toDF("vec_id", "embedding")
        // NOTE: `centroids` is the FROZEN quantizer from the full static
        // corpus — deriving it per batch would re-cluster on partial data
        // and change assignments between batches
        Similarity.semanticContamination(
          Similarity.prepare(combined, "vec_id", "embedding"),
          centroids, col("vid") % 10 === 0, 0.4, m = 2)
          .collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getDouble(2))))
        ()
      }
      .start()

    try {
      // train vectors arrive across three micro-batches (test slice never
      // re-sent — it is the frozen side)
      val train = all.filterNot(_._1 % 10 == 0)
      train.grouped(math.max(1, train.size / 3 + 1)).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet === want,
      "incremental verdicts must equal the batch pass bit-for-bit")
  }
}
