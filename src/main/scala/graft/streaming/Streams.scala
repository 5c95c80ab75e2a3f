package graft.streaming

import graft.operators.Incremental
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (builder brief; SURVEY §2.10 notes the
  * reference's incremental behaviors are checkpointed batch — these are
  * their streaming-native equivalents, same transforms, streaming
  * source/sink).
  */
object Streams {

  /** Watermarked tumbling-window rollup of an event stream — the
    * streaming twin of the events_hourly batch query. Works on both
    * batch and streaming frames (same declarative plan). */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count("*").as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class Ev(ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                           n_events: Int, closed: Boolean)

  /** Stateful sessionization: sessions close after `gapMinutes` of
    * silence, tracked per user with event-time timeout — the streaming
    * twin of the events_sessions lag-window query
    * (flatMapGroupsWithState, as the brief's custom-state example). */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(user: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(user, s.start, s.last, s.n, closed = true))
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val closed = Seq.newBuilder[Session]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
            case Some(s) =>
              closed += Session(user, s.start, s.last, s.n, closed = true)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Continuous index maintenance: each micro-batch is checksum-gated
    * through the SAME anti-join upsert as the batch path (P4/J6) — the
    * streaming rendition of the reference's re-ingest story
    * (foreachBatch keeps the batch semantics exactly). */
  def incrementalUpsert(stream: DataFrame, statePath: String,
                        idCol: String, checksumCol: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val prev =
          try spark.read.parquet(statePath)
          catch { case _: Exception => batch.limit(0) }
        val changed = Incremental.changed(batch, prev, idCol, checksumCol)
        if (!changed.isEmpty) {
          Incremental.upsert(prev, changed, idCol)
            .write.mode("overwrite").parquet(statePath + ".next")
          // atomic-ish swap left to the deployment layer; kept simple here
        }
      }
      .start()
}
