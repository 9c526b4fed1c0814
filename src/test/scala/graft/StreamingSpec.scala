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
}
