package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream shape
  * `(event_id, ts, user_id, event_type, value)`.
  *
  * The reference has no streaming engine (SURVEY.md §1.3 — GDAL is a
  * single-pass pull iterator); these operators are the Spark-native
  * incremental expression of the batch semantics in
  * `SparkEntry.q_events_hourly` / `q_sessionize`:
  *  - [[hourlyCounts]]: watermarked tumbling-window aggregation
  *  - [[sessionize]]: gap-based sessions via
  *    `flatMapGroupsWithState` with event-time timeout — the stateful
  *    per-key path the north rule's checkpointed-resume story builds on
  *    (checkpointLocation gives exactly-once restart).
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** One schema derived from the case class — hand-copied literals in the
    * two file jobs could drift from Event silently.
    */
  private val eventSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[Event].schema

  final case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Long, duration_sec: Long)

  /** Tumbling 1-hour counts per event type with a 2-hour watermark. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("event_type"), col("window.start").as("hour"), col("n"), col("sum_value"))

  /** End-to-end file job: parquet event files appearing under `inDir` →
    * watermarked hourly aggregation → append-mode parquet under `outDir`,
    * exactly-once across kill/restart via `checkpointDir` (file-source
    * offsets + state store + sink commit log all live there — restart
    * with the same three paths resumes mid-stream, the per-partition
    * lineage story of the north rule applied to streams).
    */
  def hourlyCountsFileJob(spark: org.apache.spark.sql.SparkSession,
                          inDir: String, outDir: String,
                          checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = eventSchema
    val in = spark.readStream.schema(schema).parquet(inDir)
    hourlyCounts(in)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** End-to-end STATEFUL file job: parquet events → gap sessionization
    * (flatMapGroupsWithState keeps per-user state in the checkpoint's
    * state store) → append parquet. Killing and restarting with the same
    * checkpoint resumes with open sessions intact — the strongest form of
    * the north rule's checkpointed-resume story (offsets + mutable state
    * + sink commits all recovered).
    */
  def sessionizeFileJob(spark: org.apache.spark.sql.SparkSession,
                        inDir: String, outDir: String, checkpointDir: String,
                        gapMinutes: Int = 30)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    val schema = eventSchema
    val in = spark.readStream.schema(schema).parquet(inDir).as[Event]
    sessionize(in, gapMinutes)
      .writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Gap-based sessionization (30-min inactivity closes a session).
    * Emits a session row when the gap timeout fires.
    *
    * LATE-EVENT MERGE TRADEOFF: the within-gap guard `t − s.lastTs ≤ gapMs`
    * admits ANY event at or below the session's current extent, so a
    * late-but-within-watermark event far OLDER than sessionStart − gap
    * back-extends the open session instead of forming its own, separate,
    * earlier session. Strict gap semantics would split there — but the
    * older session would already have violated its own gap timeout, and
    * splitting retroactively would require emitting a session for a window
    * the state no longer covers. We deliberately merge: one session whose
    * span covers both, which keeps durations non-negative, state bounded,
    * and restarts deterministic. Events older than the 2-hour watermark are
    * dropped by Spark before reaching this function either way.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.sessionStart),
              s.nEvents, (s.lastTs - s.sessionStart) / 1000))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var out = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  // a late-but-within-watermark event can arrive BELOW the
                  // session's current extent (cross-batch out-of-order):
                  // extend the span, never regress it — a regressed lastTs
                  // yields negative durations and spurious gap splits
                  cur = Some(SessionState(math.min(s.sessionStart, t),
                    math.max(s.lastTs, t), s.nEvents + 1))
                case Some(s) => // gap exceeded: close previous, open new
                  out ::= SessionOut(userId, new java.sql.Timestamp(s.sessionStart),
                    s.nEvents, (s.lastTs - s.sessionStart) / 1000)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            out.reverseIterator
          }
      }
  }
}
