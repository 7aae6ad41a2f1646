package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Semantics of the time-series/profiling tranche (q106-q110) on crafted
  * event streams. Events are written with `ts` as a raw int64 of epoch
  * NANOSECONDS — the shape of the driver's events.parquet — so the exact
  * `Tables.load` ingestion path (nanos → µs truncation) is what's tested.
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)

  /** (event_id, epochNanos, user_id, event_type, value) rows → table dir. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("graft-events").toString
    rows.map { case (id, ns, u, et, v) => (id, ns, u, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ns(day: Int, hour: Int, minute: Int = 0): Long =
    (java.time.LocalDateTime.of(2024, 1, day, hour, minute)
      .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L

  test("q106: gaps are filled from the previous day and flagged") {
    val dir = eventsDir(Seq(
      (1L, ns(1, 5), 7L, "view", 5.0),   // day 1, early
      (2L, ns(1, 9), 7L, "view", 10.0),  // day 1, late — the day's value
      (3L, ns(3, 8), 7L, "view", 30.0)   // day 3; day 2 is a gap
    ))
    val got = q("q106_gap_fill")(spark, dir)
      .orderBy("day").as[(Long, java.sql.Date, Boolean, Double)].collect()
    assert(got.map(_._2.toString).toSeq === Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(got.map(_._3).toSeq === Seq(false, true, false))
    assert(got.map(_._4).toSeq === Seq(10.0, 10.0, 30.0)) // last-of-day, carried, fresh
  }

  test("q107: a far point is the only outlier; lower-median is an exact data value") {
    val dir = eventsDir(Seq(
      (1L, ns(1, 1), 1L, "view", 1.0),
      (2L, ns(1, 2), 1L, "view", 1.0),
      (3L, ns(1, 3), 2L, "view", 1.0),
      (4L, ns(1, 4), 2L, "view", 2.0),
      (5L, ns(1, 5), 3L, "view", 100.0)
    ))
    val got = q("q107_mad_outliers")(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length === 1)
    val (_, n, outliers, med, mad) = got.head
    // sorted values [1,1,1,2,100]: lower median 1; devs [0,0,0,1,99]: MAD 0
    assert(n === 5 && med === 1.0 && mad === 0.0)
    assert(outliers === 2) // dev 1 and dev 99 both exceed 3·0
  }

  test("q108: overlap microseconds are exact; disjoint days never pair") {
    val dir = eventsDir(Seq(
      (1L, ns(1, 10), 1L, "view", 0.0),     // a-interval day 1: 10:00..11:00
      (2L, ns(1, 11), 1L, "click", 0.0),
      (3L, ns(1, 10, 30), 1L, "purchase", 0.0), // b point inside a
      (4L, ns(2, 9), 1L, "error", 0.0)      // b on day 2: no a-interval there
    ))
    val got = q("q108_interval_join")(spark, dir)
      .as[(Long, java.sql.Date, java.sql.Date, Long, Long, Long)].collect()
    assert(got.length === 1)
    assert(got.head._6 === 0L) // point-interval: degenerate overlap
    val dir2 = eventsDir(Seq(
      (1L, ns(1, 10), 1L, "view", 0.0),
      (2L, ns(1, 12), 1L, "click", 0.0),    // a: 10:00..12:00
      (3L, ns(1, 11), 1L, "purchase", 0.0), // b: 11:00..11:30 ⊂ a
      (4L, ns(1, 11, 30), 1L, "error", 0.0)
    ))
    val got2 = q("q108_interval_join")(spark, dir2)
      .as[(Long, java.sql.Date, java.sql.Date, Long, Long, Long)].collect()
    assert(got2.length === 1 && got2.head._6 === 30L * 60L * 1000000L)
  }

  test("q109: the fold halves in sorted order") {
    val dir = eventsDir(Seq(
      (2L, ns(1, 2), 1L, "view", 3.0), // later event, larger id
      (1L, ns(1, 1), 1L, "view", 1.0)  // earlier — must fold FIRST
    ))
    val got = q("q109_ewma")(spark, dir).as[(Long, Long, Double)].collect()
    assert(got.length === 1)
    // ((0 + 1)/2 + 3)/2 = 1.75 — order-dependent, so this pins the sort
    assert(got.head === ((1L, 2L, 1.75)))
  }

  test("q110: profile matches independently computed stats") {
    val out = q("q110_profile")(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val n = li.count()
    val dq = li.select(countDistinct("l_quantity")).as[Long].head()
    val (mn, mx) = li.agg(min("l_quantity"), max("l_quantity")).as[(Double, Double)].head()
    assert(out("l_quantity") === (("l_quantity", n, 0L, dq, mn, mx)))
    assert(out.keySet.size === 7 && out.values.forall(_._2 === n))
  }
}
