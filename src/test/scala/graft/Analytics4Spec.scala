package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantics of the round-5 event-sequence tranche (q154-q156). */
class Analytics4Spec extends SparkTestBase {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)
  private val sf = "/root/testdata/sf0.001"

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    val dir = Files.createTempDirectory("graft-a4").toString
    rows.map { case (id, ts, uid, tpe, v) => (id, ts, uid, tpe, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("q154: credits the last in-window touch, 'none' beyond the hour") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 10:30:00"), 1L, "purchase", 5.0), // click 30min ago
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase", 7.0), // last touch >1h ago
      (4L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0),
      (5L, ts("2024-01-01 09:10:00"), 2L, "signup", 0.0),
      (6L, ts("2024-01-01 09:20:00"), 2L, "purchase", 3.0) // signup, not view
    ))
    val got = q("q154_attribution")(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("click", 1L, 500L), ("none", 1L, 700L), ("signup", 1L, 300L)))
  }

  test("q155: trigram paths match brute force on real data") {
    val got = q("q155_event_paths")(spark, sf).as[(String, Long)].collect()
    assert(got.length === 10)
    val ev = queries.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)].collect()
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ord = es.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      ord.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }
    val want = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    assert(got.toSeq === want)
  }

  test("q156: disorder in arrival order is flagged against the 10-min watermark") {
    // arrival (event_id) order: t=12:00 arrives FIRST, then events at
    // 11:00 (1h late) and 11:55 (5min, inside the allowance)
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 12:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click", 1.0), // 60min late
      (3L, ts("2024-01-01 11:55:00"), 1L, "click", 1.0), // 5min — on time
      (4L, ts("2024-01-01 12:30:00"), 1L, "view", 1.0)
    ))
    val got = q("q156_late_events")(spark, dir)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("click", 1L, 1L, 50L * 60 * 1000000), // one late by 60-10=50min, one on time
      ("view", 2L, 0L, 0L)))
  }

  test("q156: two-phase running max equals the naive single-window form on real data") {
    val got = q("q156_late_events")(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val ev = queries.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    var runmax = 0L
    val flags = ev.map { case (_, tpe, us) =>
      val late = runmax - us > 600000000L
      val lateUs = math.max(runmax - us - 600000000L, 0L)
      runmax = math.max(runmax, us)
      (tpe, late, lateUs)
    }
    val want = flags.groupBy(_._1).toSeq.map { case (tpe, fs) =>
      (tpe, fs.count(!_._2).toLong, fs.count(_._2).toLong, fs.map(_._3).max)
    }.sortBy(_._1)
    assert(got.toSeq === want)
  }

  test("q157: segments partition all purchasing users; buckets are exact quintiles") {
    val rows = q("q157_rfm")(spark, sf).as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (seg, n) =>
      assert(seg.length === 3 && seg.forall(c => c >= '1' && c <= '5'), seg)
      assert(n >= 1)
    }
    val nUsers = queries.Tables.load(spark, sf, "events")
      .where(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    // top-20 cap: total covered <= all purchasing users, equality when
    // segment count <= 20
    assert(rows.map(_._2).sum <= nUsers)
    // frequency quintiles brute-force: bucket of the max-frequency user is 5
    val freqs = queries.Tables.load(spark, sf, "events")
      .where(col("event_type") === "purchase")
      .groupBy("user_id").count().as[(Long, Long)].collect().map(_._2.toDouble).sorted
    def boundary(k: Int) = freqs((freqs.length * k + 4) / 5 - 1)
    val maxF = freqs.max
    val wantBucket = 1 + (1 to 4).count(k => maxF > boundary(k))
    assert(wantBucket >= 1 && wantBucket <= 5)
  }

  test("q158: sliding distinct equals brute-force window membership") {
    val rows = q("q158_sliding_distinct")(spark, sf)
      .as[(java.sql.Timestamp, Long)].collect()
    assert(rows.length === 24)
    val ev = queries.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts")).as[(Long, java.sql.Timestamp)].collect()
    val hourMs = 3600L * 1000
    rows.foreach { case (ws, n) =>
      val lo = ws.getTime
      val users = ev.filter { case (_, t) =>
        t.getTime >= lo && t.getTime < lo + 6 * hourMs
      }.map(_._1).distinct
      assert(n === users.length.toLong, s"window $ws")
    }
  }
}
