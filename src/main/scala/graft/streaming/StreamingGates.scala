package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming form of the two model-based curation gates (r7 verdict Next
  * #7): the q191 quality classifier and the q192 perplexity tercile gate,
  * run incrementally over arriving documents.
  *
  * Deployment shape is CCNet's own: the MODEL is published offline —
  * classifier token weights, the bigram LM counts, and the corpus tercile
  * boundaries, all trained batch-side by exactly the declared queries'
  * arithmetic — and the STREAM applies the frozen model to each arriving
  * doc (`foreachBatch`; every doc arrives whole, and both gates are
  * strictly per-document given the model, so batch-local scoring is exact
  * — no cross-batch state to carry, unlike the dedup index). At 100 TB
  * the model tables are token/bigram dictionaries (data-dependent but
  * corpus-vocabulary-bounded); they broadcast to the scoring join the way
  * a fastText/KenLM artifact ships to workers.
  *
  * The parity contract (StreamingGatesSpec): the union of per-doc rows
  * emitted over the stream's life — across a stop/resume — equals the
  * declared q191 scores/keeps and q192 tiers on the same corpus.
  */
object StreamingGates {

  /** Frozen gate model: q191's token weights, q192's LM counts + vocab
    * size + tercile boundaries. All integer/ppm — the cross-engine
    * determinism discipline the declared queries pin.
    */
  case class GateModel(weights: DataFrame, uni: DataFrame, bi: DataFrame,
      vocabV: Long, bd1: Long, bd2: Long)

  /** Train the model on a batch corpus with the DECLARED queries'
    * arithmetic: NB token rates w_ppm = (c_pos+1)·10⁶ div (c_all+2)
    * (q191), add-one bigram LM (q124/q192 core), tercile boundaries via
    * grid rank-select (q192 — no global sort).
    */
  def train(docs: DataFrame): GateModel = {
    val Stop = graft.queries.TextQueries.Stop
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val base = docs.select(col("doc_id"), toks.as("t"))
      .withColumn("lb",
        (size(col("t")) >= 10 &&
          size(filter(col("t"), x => length(x) > 20)) === 0 &&
          size(filter(col("t"), x => x.isin(Stop: _*))) > 0).cast("long"))
    val weights = base.select(col("lb"), explode(col("t")).as("w"))
      .groupBy(col("w"))
      .agg(sum(col("lb")).as("c_pos"), count(lit(1)).as("c_all"))
      .select(col("w"), expr("((c_pos + 1) * 1000000) div (c_all + 2)").as("w_ppm"))

    val uni = base.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_a"))
      .withColumnRenamed("w", "w1")
    val docBi = base.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("t"), 2)).as("b"))
    val bi = docBi.groupBy(col("b")).agg(count(lit(1)).as("c_ab"))
    val v = uni.count()

    // tercile boundaries over the batch corpus's per-doc fluency — the
    // same rank-select machinery q192 declares (no global sort)
    val scored = scoreFluency(docBi, uni, bi, v)
      .withColumn("k", lit(1))
      .withColumn("f_d", col("fluency_ppm").cast("double"))
    val bounds = graft.operators.RobustStats.rankSelectMultiByKey(
        scored, "k", "f_d", Seq((1, 3, "b1"), (2, 3, "b2")))
      .groupBy(col("k"))
      .agg(max(when(col("_q") === "b1", col("_value"))).as("bd1"),
        max(when(col("_q") === "b2", col("_value"))).as("bd2"))
      .head
    GateModel(weights, uni, bi, v,
      bounds.getDouble(1).toLong, bounds.getDouble(2).toLong)
  }

  /** Per-doc fluency from (doc_id, bigram) rows under frozen LM counts. */
  private def scoreFluency(docBi: DataFrame, uni: DataFrame, bi: DataFrame,
      vocabV: Long): DataFrame =
    docBi
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .join(broadcast(bi), "b")
      .join(broadcast(uni), "w1")
      .withColumn("v", lit(vocabV))
      .select(col("doc_id"), expr("((c_ab + 1) * 1000000) div (c_a + v)").as("p_ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_ppm")).as("sp"))
      .select(col("doc_id"), col("n_bigrams"), expr("sp div n_bigrams").as("fluency_ppm"))

  /** Apply both frozen gates to one (batch-local) set of whole documents.
    * Docs with < 2 tokens have no bigrams and carry null fluency/tier —
    * the same docs q192 (deliberately) leaves unscored.
    */
  def score(batch: DataFrame, model: GateModel): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val base = batch.select(col("doc_id"), toks.as("t"))
    val tok = base.select(col("doc_id"), explode(col("t")).as("w"))
    val classified = tok.join(broadcast(model.weights), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum(w_ppm) div count(1)").as("score_ppm"))
      .select(col("doc_id"), col("n_tokens"), col("score_ppm"),
        (col("score_ppm") >= 500000L).as("keep"))
    val docBi = base.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("t"), 2)).as("b"))
    val tiered = scoreFluency(docBi, model.uni, model.bi, model.vocabV)
      .select(col("doc_id"), col("fluency_ppm"),
        when(col("fluency_ppm") <= lit(model.bd1), "tail")
          .when(col("fluency_ppm") > lit(model.bd2), "head")
          .otherwise("middle").as("tier"))
    classified.join(tiered, Seq("doc_id"), "left_outer")
  }

  /** Start the streaming gate: arriving docs (doc_id, text) are scored
    * under the frozen model and appended to `outPath`. Checkpointed —
    * stop/resume replays no doc twice.
    */
  def start(stream: DataFrame, model: GateModel, outPath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        score(batch, model).write.mode("append").parquet(outPath)
      }
      .start()
}
