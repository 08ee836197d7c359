package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference is pure batch (SURVEY.md §2.9) — this module is the
  * engine's forward-looking streaming layer over the same `events` schema:
  * watermarked tumbling/sliding window aggregation, and stateful
  * sessionization via `flatMapGroupsWithState` (the batch twin lives in
  * `operators.Intervals.sessionize`; specs assert they agree).
  */
object StreamOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Watermarked tumbling-window counts per event type. Works identically
    * on a `readStream` or a batch frame (batch ignores the watermark). */
  def tumblingCounts(events: DataFrame, window_ : String, watermark: String): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // decimal sum: exact regardless of partition/merge order
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  /** Streaming dedup: drop repeated ids inside the watermark horizon —
    * the streaming twin of exact dedup (state is bounded by the
    * watermark, so it runs forever at 100 TB/day event volumes). */
  def dedupStream(events: DataFrame, idCols: Seq[String], watermark: String): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    if (events.isStreaming) src.dropDuplicatesWithinWatermark(idCols)
    else src.dropDuplicates(idCols)
  }

  /** Stateful sessionization: events within `gapSeconds` of the previous
    * event for the same user share a session; a session closes on timeout.
    */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 1, e.value)
            else if (t - st.last <= gapSeconds * 1000L)
              st = st.copy(last = t, n = st.n + 1, total = st.total + e.value)
            else {
              out += SessionOut(userId, new java.sql.Timestamp(st.start),
                new java.sql.Timestamp(st.last), st.n,
                math.round(st.total * 100.0) / 100.0)
              st = SessionState(t, t, 1, e.value)
            }
          }
          if (st != null) state.update(st) else state.remove()
          out.iterator
      }
  }
}
