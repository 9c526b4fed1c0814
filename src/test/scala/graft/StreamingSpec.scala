package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)

  test("watermarked hourly counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(61), 2, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first hour windows
      input.addData(Event(9, ts(400), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select($"event_type", $"n", $"sum_value").as[(String, Long, Double)]
        .collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization emits gap-closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two sessions (gap 40 min); user 2: one session
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 1.0),
        Event(3, ts(50), 1, "click", 1.0),
        Event(4, ts(5), 2, "view", 1.0))
      q.processAllAvailable()
      // push watermark forward so all sessions time out
      input.addData(Event(9, ts(600), 3, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(10, ts(1200), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select($"user_id", $"n_events", $"duration_sec").as[(Long, Long, Long)]
        .collect().toSet
      assert(rows.contains((1L, 2L, 600L)), s"got $rows")  // 0..10 min session
      assert(rows.contains((1L, 1L, 0L)), s"got $rows")    // 50 min session
      assert(rows.contains((2L, 1L, 0L)), s"got $rows")
    } finally q.stop()
  }

  test("sessionize: cross-batch out-of-order event extends, never regresses") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").start()
    try {
      // batch 1: state (start=20min, last=20min); watermark still at -2h
      input.addData(Event(1, ts(20), 7, "click", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event 15 min earlier — merges (|gap| <= 30 min)
      // and must extend the session span backwards, not regress lastTs
      input.addData(Event(2, ts(5), 7, "click", 1.0))
      q.processAllAvailable()
      // flush: move the watermark far past the session timeout
      input.addData(Event(3, ts(600), 8, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(1200), 8, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_ooo")
        .filter($"user_id" === 7L)
        .select($"n_events", $"duration_sec").as[(Long, Long)]
        .collect().toSet
      // one session of 2 events spanning 5..20 min = 900 s (the regressed
      // fold yielded a NEGATIVE duration of -900 s here)
      assert(rows === Set((2L, 900L)), s"got $rows")
    } finally q.stop()
  }

  test("file job: kill + checkpoint restart is exactly-once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    new java.io.File(inDir).mkdirs()

    def hourTs(h: Long, min: Long = 0L) =
      new Timestamp(1700000000000L / 3600000L * 3600000L + h * 3600000L + min * 60000L)
    def writeBatch(name: String, evs: Seq[Event]): Unit = {
      // the file stream source lists top-level files only: stage the
      // batch, then move its part file to $inDir/$name.parquet
      val stage = s"$base/stage-$name"
      evs.toDS().toDF().coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }

    // batch 1a: window H0 data; 1b: H3/H4 events push the watermark so H0
    // (and H1) finalize BEFORE the kill
    val b1a = Seq(Event(1, hourTs(0, 10), 1, "a", 1.0), Event(2, hourTs(0, 20), 2, "a", 2.0),
      Event(3, hourTs(1, 5), 1, "b", 3.0))
    val b1b = Seq(Event(4, hourTs(3, 30), 3, "a", 4.0), Event(5, hourTs(4, 30), 3, "b", 5.0))

    writeBatch("b1a", b1a)
    val q1 = EventStream.hourlyCountsFileJob(spark, inDir, outDir, ckDir)
    q1.processAllAvailable()
    writeBatch("b1b", b1b)
    q1.processAllAvailable() // watermark advances to H2:30 AFTER this batch
    // a window only flushes in the batch AFTER the watermark passes its
    // end — b1c triggers that flush so H0/H1 finalize before the kill
    val b1c = Seq(Event(9, hourTs(4, 45), 3, "b", 9.0))
    writeBatch("b1c", b1c)
    q1.processAllAvailable()
    q1.stop() // the "kill"

    val preKill = spark.read.parquet(outDir).count()

    // while down: more data lands (H8), plus a final H10 batch after
    // restart to advance the watermark and flush H2..H4
    writeBatch("b2", Seq(Event(6, hourTs(8, 15), 4, "a", 6.0)))
    val q2 = EventStream.hourlyCountsFileJob(spark, inDir, outDir, ckDir)
    q2.processAllAvailable()
    writeBatch("b3", Seq(Event(7, hourTs(10, 0), 5, "c", 7.0)))
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
      .select($"event_type", $"hour", $"n", $"sum_value")
      .as[(String, Timestamp, Long, Double)].collect().toSeq.sorted

    // batch twin restricted to finalized windows: the LAST executed
    // micro-batch (b3) ran with watermark H8:15 − 2h = H6:15, so exactly
    // the windows ending ≤ H6:15 (hours 0..5) have been emitted — the
    // H10 data advances the watermark only after that batch
    val allEvents = b1a ++ b1b ++ b1c ++ Seq(Event(6, hourTs(8, 15), 4, "a", 6.0))
    val expected = allEvents.filter(_.ts.getTime < hourTs(6).getTime)
      .groupBy(e => (e.event_type, e.ts.getTime / 3600000L * 3600000L))
      .map { case ((t, h), es) =>
        (t, new Timestamp(h), es.size.toLong, es.map(_.value).sum) }
      .toSeq.sorted

    assert(out === expected, s"restarted stream output:\n$out\nvs expected:\n$expected")
    // exactly-once: the pre-kill emission was not duplicated by the restart
    assert(preKill > 0, "some window must finalize before the kill")
    assert(out.size === expected.size)
  }

  test("sessionize file job: open per-user state survives kill + restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    new java.io.File(inDir).mkdirs()
    def mts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    def writeBatch(name: String, evs: Seq[Event]): Unit = {
      val stage = s"$base/stage-$name"
      evs.toDS().toDF().coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles().find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }

    // open sessions for users 1 and 2, then KILL with both still open
    writeBatch("b1", Seq(
      Event(1, mts(0), 1, "a", 1.0), Event(2, mts(10), 1, "a", 1.0),
      Event(3, mts(0), 2, "b", 1.0), Event(4, mts(5), 2, "b", 1.0)))
    val q1 = EventStream.sessionizeFileJob(spark, inDir, outDir, ckDir)
    q1.processAllAvailable()
    q1.stop()

    // while down: user 1 returns after a 90-min gap — on restart the
    // RECOVERED state must close the pre-kill session (start 0, 2 events)
    writeBatch("b2", Seq(Event(5, mts(100), 1, "a", 1.0),
      Event(6, mts(100), 99, "t", 0.0)))
    val q2 = EventStream.sessionizeFileJob(spark, inDir, outDir, ckDir)
    q2.processAllAvailable()
    // watermark pushers so event-time timeouts fire for the rest
    writeBatch("b3", Seq(Event(7, mts(400), 99, "t", 0.0)))
    q2.processAllAvailable()
    writeBatch("b4", Seq(Event(8, mts(500), 99, "t", 0.0)))
    q2.processAllAvailable()
    q2.stop()

    val out = spark.read.parquet(outDir)
      .select($"user_id", $"session_start", $"n_events", $"duration_sec")
      .as[(Long, Timestamp, Long, Long)].collect().toSet
      .filter(_._1 != 99L) // drop the watermark-ticker user's own sessions
    val expected = Set(
      (1L, mts(0), 2L, 600L),   // closed by the post-restart gap (recovered state)
      (2L, mts(5 - 5), 2L, 300L).copy(_2 = mts(0)), // timeout-closed
      (1L, mts(100), 1L, 0L))   // second session, timeout-closed
    assert(out === expected, s"sessions:\n$out\nexpected:\n$expected")
  }
}
