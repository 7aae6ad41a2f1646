package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (UDAF surface): exact bounded top-k of
  * (id, score) pairs per group — the aggregation-shaped alternative to the
  * window + filter top-k. The buffer is a small sorted list capped at k,
  * so partial aggregation ships at most k pairs per group per task: for
  * top-k this is the minimal-shuffle formulation (map-side combine does
  * the pruning), demonstrating `TypedImperativeAggregate`-class semantics
  * through the stable `Aggregator` API.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * window formulation in [[graft.operators.Similarity]].
  */
class TopKAggregate(k: Int) extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: List[(Long, Double)], x: (Long, Double)): List[(Long, Double)] = {
    // Keep the buffer sorted best-first and capped at k.
    val (front, back) = buf.span(better(_, x))
    val merged = front ::: x :: back
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  override def zero: List[(Long, Double)] = Nil

  override def reduce(buf: List[(Long, Double)], row: (Long, Double)): List[(Long, Double)] =
    if (buf.lengthCompare(k) >= 0 && better(buf.last, row)) buf else insert(buf, row)

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    Encoders.kryo[List[(Long, Double)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
}
