package graft

import graft.functions.NumericBitsSupport
import graft.operators.RobustStats
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** RobustStats' bucketed rank-select must agree with the brute-force sorted
  * lower median on ANY input — duplicates crossing the rank boundary,
  * negative values, single-element keys, values collapsing into one bucket.
  * The sortable-bits map must be a monotone bijection of double order.
  */
class RobustStatsSpec extends AnyFunSuite {

  lazy val spark = SparkSessionHolder.spark

  private def checkProp(p: Prop, min: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  test("doubleSortableBits preserves double ordering (incl. negatives, zero)") {
    val g = Gen.chooseNum(-1e12, 1e12)
    checkProp(Prop.forAll(g, g) { (a, b) =>
      val (ka, kb) = (NumericBitsSupport.doubleSortableBits(a),
        NumericBitsSupport.doubleSortableBits(b))
      (a < b) == (ka < kb) && (a == b) == (ka == kb)
    }, 200)
  }

  test("lowerMedianByKey equals brute-force sorted lower median on random data") {
    import spark.implicits._
    val gen = for {
      nKeys <- Gen.choose(1, 4)
      rows <- Gen.nonEmptyListOf(for {
        k <- Gen.choose(0, nKeys - 1)
        // mixed scales + duplicates: a small value pool forces rank ties
        v <- Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble),
          Gen.chooseNum(-1e6, 1e6))
      } yield (s"k$k", v))
    } yield rows
    checkProp(Prop.forAll(gen) { rows =>
      val df = rows.toDF("key", "v")
      val got = RobustStats.lowerMedianByKey(df, "key", "v", out = "med")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = rows.groupBy(_._1).map { case (k, rs) =>
        val sorted = rs.map(_._2).sorted
        k -> sorted((sorted.size + 1) / 2 - 1)
      }
      got == want
    }, 30)
  }

  test("q107's MAD output matches a brute-force computation on a fixed slice") {
    import spark.implicits._
    // deterministic fixture: two event types with known medians
    val rows = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      ("b", 10.0), ("b", 10.0), ("b", 10.0), ("b", 50.0))
    val df = rows.toDF("event_type", "value")
    val med = RobustStats.lowerMedianByKey(df, "event_type", "value", out = "med")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(med == Map("a" -> 3.0, "b" -> 10.0))
    val dev = df.join(broadcast(
        RobustStats.lowerMedianByKey(df, "event_type", "value", out = "med")),
        "event_type")
      .select(col("event_type"), abs(col("value") - col("med")).as("dev"))
    val mad = RobustStats.lowerMedianByKey(dev, "event_type", "dev", out = "mad")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: devs = 2,1,0,1,97 -> sorted 0,1,1,2,97 -> lower median 1
    // b: devs = 0,0,0,40   -> sorted 0,0,0,40   -> lower median 0
    assert(mad == Map("a" -> 1.0, "b" -> 0.0))
  }
}
