package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the windowed rollups in
  * [[graft.streaming.Streams]]: volume-anomaly scoring over the hourly
  * series. The data-pipeline use is ingest monitoring — a scrape source
  * whose hourly document volume spikes or collapses (bot storm, silent
  * outage) should be flagged before its batch enters the training mix.
  */
object Events {

  /** Ordered-funnel conversion: for each user, the earliest time of
    * stage 1, the earliest stage-2 AT-OR-AFTER that, the earliest
    * stage-3 at-or-after that, and so on — then one row per stage with
    * how many users reached it and the exact integer SUM and MAX of the
    * stage-1→stage-k deltas (order-independent, engine-identical; an
    * interpolated median's fractional cast rounds differently across
    * engines, so it stays out of the oracle surface). The sequential
    * constraint (each stage must follow the previous one IN TIME) is
    * what a naive per-stage `min(ts)` gets wrong.
    *
    * Shape: one shuffle on user, a per-user fold done as min-over-
    * filtered-view array expressions per stage over ONE collected
    * per-user event list (bounded by that user's STAGE-event count),
    * then a tiny per-stage rollup. Null users are excluded up front
    * (the oracle's equi-join semantics — NULL never equals NULL), and
    * the rollup is TOTAL: every stage emits a row even over an empty
    * input (count 0, null delta sums — same as the oracle's aggregate
    * over an empty frame). A pathological power user concentrates that
    * user's stage events into one array row; [[funnelIterative]] is the
    * per-stage-aggregate twin with no per-user array for that regime.
    *
    * `maxStepNs` bounds each CONVERSION STEP: stage k counts only if
    * its earliest qualifying event lands within `maxStepNs` of stage
    * k-1's reach time (t_k = min{t : t >= t_{k-1} ∧ t - t_{k-1} ≤ T}) —
    * the windowed-conversion knob of real funnel reports ("purchased
    * within 7 days of clicking"). Stage 1 is never windowed (it has no
    * predecessor), and a stage missed because every candidate fell
    * outside the window nulls all later stages, exactly like a stage
    * with no events at all. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             stages: Seq[String], tsCol: String = "ts",
             maxStepNs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(maxStepNs.forall(_ > 0), "maxStepNs must be positive")
    // per user: collect this user's (ts, type) pairs once, then fold the
    // stage thresholds with array expressions — no self-joins, no
    // per-stage shuffles; the array is bounded by the user's event count
    val perUser = events
      .where(col(typeCol).isin(stages.map(x => x: Any): _*) &&
        col(userCol).isNotNull)
      .groupBy(col(userCol).as("user"))
      // list order is irrelevant: every fold below is a min over a
      // filtered view, order-independent by construction
      .agg(collect_list(struct(col(tsCol).as("t"), col(typeCol).as("y")))
        .as("evs"))
    val stageTimes = stages.zipWithIndex.foldLeft(perUser) {
      case (df, (stage, i)) =>
        val prev = if (i == 0) lit(Long.MinValue) else col(s"t$i")
        // earliest event of this stage at-or-after the previous stage's
        // reach time; null propagates (never reached ⇒ later stages null).
        // The window bound applies only past stage 1 (stage 1 has no
        // predecessor, and prev + T would overflow off Long.MinValue)
        val firstAtOrAfter = array_min(filter(col("evs"),
          e => {
            val base = e.getField("y") === stage && e.getField("t") >= prev
            maxStepNs match {
              case Some(t) if i > 0 => base && e.getField("t") <= prev + t
              case _                => base
            }
          }).getField("t"))
        df.withColumn(s"t${i + 1}",
          if (i == 0) firstAtOrAfter
          else when(prev.isNotNull, firstAtOrAfter))
    }
    // tiny rollup: one row per stage (bounded by #stages), via ONE
    // exploded per-stage array so the per-user aggregation runs once
    // (a union of per-stage selects would recompute it per stage)
    val stageStructs = array(stages.zipWithIndex.map { case (stage, i) =>
      val t = col(s"t${i + 1}")
      struct(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
        t.isNotNull.cast("long").as("reached"),
        when(t.isNotNull, t - col("t1")).as("dt"))
    }: _*)
    val agg = stageTimes.select(explode(stageStructs).as("s"))
      .select(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"),
        col("s.reached").as("reached"), col("s.dt").as("dt"))
      .groupBy("stage_idx", "stage")
      .agg(sum("reached").as("n_users"),
        sum("dt").as("sum_dt_ns"), max("dt").as("max_dt_ns"))
    stageRollupTotal(events.sparkSession, stages, agg)
  }

  /** Left-join the aggregated stage rows onto the full literal stage
    * list so the rollup is TOTAL — one row per stage even when nothing
    * matched (n_users 0, null deltas), the oracle's aggregate-over-
    * empty-frame semantics. */
  private def stageRollupTotal(spark: SparkSession, stages: Seq[String],
                               agg: DataFrame): DataFrame = {
    import spark.implicits._
    val all = stages.zipWithIndex
      .map { case (stage, i) => (i + 1, stage) }.toDF("stage_idx", "stage")
    all.join(agg, Seq("stage_idx", "stage"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        col("sum_dt_ns"), col("max_dt_ns"))
      .orderBy("stage_idx")
  }

  /** The no-per-user-array twin of [[funnel]] for pathologically hot
    * users: stage k's reach times come from a per-stage aggregation
    * chain (the oracle's own shape) — S aggregation passes over the
    * stage events, each a combinable min keyed by user, no
    * collect_list, so one bot user with millions of stage events never
    * concentrates into a single array row. Results are identical by
    * construction (property-pinned in AsOfEventsSpec); prefer it when
    * per-user stage-event counts are unbounded, [[funnel]] when S
    * passes over the event table cost more than one. */
  def funnelIterative(events: DataFrame, userCol: String, typeCol: String,
                      stages: Seq[String], tsCol: String = "ts",
                      maxStepNs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(maxStepNs.forall(_ > 0), "maxStepNs must be positive")
    val ev = events.where(col(typeCol).isin(stages.map(x => x: Any): _*) &&
        col(userCol).isNotNull)
      .select(col(userCol).as("user"), col(tsCol).as("t"), col(typeCol).as("y"))
    val users = ev.select("user").distinct()
    // each stage's reach derives from the PREVIOUS reach frame (which by
    // construction holds only users that reached it — no null filter
    // needed), keeping plan lineage linear in S; folding the growing
    // wide frame back in instead would embed acc twice per stage and
    // double the logical plan each step
    val reaches = stages.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (stage, i)) =>
        val r =
          if (i == 0)
            ev.where(col("y") === stage).groupBy("user").agg(min("t").as("t1"))
          else
            ev.where(col("y") === stage)
              .join(acc.head.select(col("user"), col(s"t$i")), "user")
              .where(col("t") >= col(s"t$i") &&
                maxStepNs.map(t => col("t") <= col(s"t$i") + t).getOrElse(lit(true)))
              .groupBy("user").agg(min("t").as(s"t${i + 1}"))
        r :: acc
    }.reverse
    val wide = reaches.foldLeft(users)((acc, r) => acc.join(r, Seq("user"), "left"))
    val stageStructs = array(stages.zipWithIndex.map { case (stage, i) =>
      val t = col(s"t${i + 1}")
      struct(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
        t.isNotNull.cast("long").as("reached"),
        when(t.isNotNull, t - col("t1")).as("dt"))
    }: _*)
    val agg = wide.select(explode(stageStructs).as("s"))
      .select(col("s.stage_idx").as("stage_idx"), col("s.stage").as("stage"),
        col("s.reached").as("reached"), col("s.dt").as("dt"))
      .groupBy("stage_idx", "stage")
      .agg(sum("reached").as("n_users"),
        sum("dt").as("sum_dt_ns"), max("dt").as("max_dt_ns"))
    stageRollupTotal(events.sparkSession, stages, agg)
  }

  /** Row-level session assignment — the event-grain twin of the
    * `events_sessions` rollup: every event tagged with its user-scoped
    * session ordinal (`session_seq`, 1-based), the key downstream
    * grouping/sequence-extraction steps need (a per-session document of
    * a user's actions, session-scoped features). Same single user-keyed
    * window as the rollup: a lag gap flag, then its running sum.
    *
    * Scale: ONE shuffle + per-user sort. A pathologically hot user pins
    * one task's sort; session boundaries are a sequential fold, so the
    * (key, time-bucket) spread of [[AsOf.asofJoinBucketed]] composes
    * only with boundary stitching across buckets — at that skew,
    * pre-split the user's timeline and stitch the first session of each
    * bucket onto the previous bucket's last. Not built here: the
    * stitching pass costs more than the sort until a single user
    * exceeds a task's memory. */
  def assignSessions(events: DataFrame, userCol: String,
                     tsCol: String = "ts", idCol: String = "event_id",
                     gapNs: Long = 1800000000000L): DataFrame = {
    require(gapNs > 0, "gapNs must be positive")
    val clash = Seq("_prev", "_new", "session_seq")
      .filter(events.columns.contains)
    require(clash.isEmpty, s"columns collide with session working/output names: $clash")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(tsCol, idCol)
    events
      .withColumn("_prev", lag(tsCol, 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col(tsCol) - col("_prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("_new").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .drop("_prev", "_new")
  }

  /** Retention cohorts: users grouped by first-seen day (the cohort),
    * counted by how many were active again k days later — the
    * engagement decay table every event pipeline reports. Two
    * combinable aggregations (per-user first day, then per
    * (cohort, offset) distinct users); day arithmetic on integer
    * day-buckets. */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String = "ts", maxDays: Int = 30): DataFrame = {
    val day = expr(s"`$tsCol` div ${86400L * 1000000000L}")
    val userDays = events.select(col(userCol).as("user"), day.as("day")).distinct()
    val firstDay = userDays.groupBy("user").agg(min("day").as("cohort_day"))
    userDays.join(firstDay, "user")
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .where(col("day_offset") <= maxDays)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user").as("n_users"))
  }

  /** Trailing-window rolling statistics over the hourly volume series:
    * for each (hour, series) the window count, observed-hour count, and
    * floor-average over the trailing `windowHours` hours — the smoothed
    * ingest-volume view that [[hourlyAnomalies]]' global z-score cannot
    * give (a diurnal corpus needs "vs the last day", not "vs all
    * time").
    *
    * Shape: ONE combinable count collapses events to the hourly grain
    * (the only pass that sees data-scale rows), then a per-series
    * RANGE-framed window over the ≤ #series × #hours hourly frame —
    * RANGE, not ROWS, so a silent hour (missing row) still ages out of
    * the window by its bucket distance rather than by row position.
    * All outputs are longs: the average is integer floor-division of
    * non-negative counts (`div` ≡ `//` there — the library's rounding
    * doctrine; a double mean can land on a round-half boundary where
    * engines disagree). At 100 TB the events-scale work is the grouped
    * count's map-side combine; the window exchange moves only the tiny
    * hourly frame, re-keyed by series. */
  def rollingHourly(events: DataFrame, seriesCol: String,
                    tsCol: String = "ts", windowHours: Int = 24): DataFrame = {
    require(windowHours >= 1, "windowHours must be >= 1")
    val hourly = hourlyCounts(events, seriesCol, tsCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(seriesCol)
      .orderBy("hour_bucket")
      .rangeBetween(-(windowHours - 1).toLong, 0L)
    hourly
      .withColumn("win_n", sum("n_events").over(w))
      .withColumn("win_hours", count(lit(1)).over(w))
      .withColumn("avg_n", expr("win_n div win_hours"))
      .select(col("hour_bucket"), col(seriesCol), col("n_events"),
        col("win_n"), col("win_hours"), col("avg_n"))
  }

  /** Per-(series, hour) volume z-scores with an anomaly flag.
    *
    * Two shuffles total: one combinable count to the (hour, series)
    * grain, then the per-series moment window — a second, coarser-keyed
    * exchange over the already-tiny hourly frame (≤ #series × #hours
    * rows), never over the events. The z-score uses explicit integer
    * moments (n, Σx, Σx²) rather than `stddev_samp` so the arithmetic
    * sequence is bit-identical in any engine that sums exact long
    * counts — the oracle twin mirrors the formula token for token. σ=0
    * series (constant volume) emit NULL z and never flag.
    *
    * @param events    frame with a long-nanos timestamp column
    * @param seriesCol grouping column defining each monitored series
    * @param tsCol     the long-nanos timestamp column name
    * @param zFlag     |z| at or above which `is_anomaly` fires
    */
  /** The shared hourly grain (one combinable count — the only pass that
    * sees event-scale rows): (hour_bucket, series, n_events) with the
    * bucket as integer `div` of the long-nanos ts. BOTH
    * [[hourlyAnomalies]] and [[rollingHourly]] (and their oracles)
    * define the grain through this one expression. */
  private def hourlyCounts(events: DataFrame, seriesCol: String,
                           tsCol: String): DataFrame =
    events
      .groupBy(expr(s"`$tsCol` div 3600000000000").as("hour_bucket"), col(seriesCol))
      .agg(count(lit(1)).as("n_events"))

  /** The shared hourly grain as a PUBLIC partial aggregate — the piece
    * an incremental rollup pipeline materializes per ingest batch.
    * Counts are re-aggregable: see [[mergeHourly]]. */
  def hourlyGrain(events: DataFrame, seriesCol: String,
                  tsCol: String = "ts"): DataFrame =
    hourlyCounts(events, seriesCol, tsCol)

  /** Merge partial hourly rollups — incremental aggregate maintenance:
    * a new batch's [[hourlyGrain]] merges into the stored rollup with
    * ONE combinable sum over |buckets| rows (never re-scanning event
    * history; counts are decomposable, so merge(partials) ≡ the direct
    * aggregate — the oracle pins that equality). At 100 TB of events
    * this is the difference between an O(|day|) nightly update and an
    * O(|history|) recompute. */
  def mergeHourly(seriesCol: String, parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "need at least one partial rollup")
    parts.reduce(_.unionByName(_))
      .groupBy("hour_bucket", seriesCol)
      .agg(sum("n_events").as("n_events"))
  }

  def hourlyAnomalies(events: DataFrame, seriesCol: String,
                      tsCol: String = "ts",
                      zFlag: Double = 3.0): DataFrame = {
    val hourly = hourlyCounts(events, seriesCol, tsCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(seriesCol)
    val cnt = count(lit(1)).over(w)
    val s1 = sum(col("n_events")).over(w)
    val s2 = sum(col("n_events") * col("n_events")).over(w)
    // exact long moments → IEEE-deterministic double arithmetic; the
    // division/sqrt order here IS the contract the oracle copies
    val mu = s1.cast("double") / cnt
    val variance = (s2.cast("double") - s1.cast("double") * s1 / cnt) / (cnt - 1)
    // guard on variance>0, not sigma>0: a constant series can produce a
    // tiny NEGATIVE variance under cancellation, and sqrt(<0) is NaN in
    // one engine and an error in another — never reach it
    val z: Column = when(cnt > 1 && variance > 0,
      round((col("n_events").cast("double") - mu) / sqrt(variance), 6))
    hourly
      .withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(col("z")) >= zFlag, lit(false)))
      .select(col("hour_bucket"), col(seriesCol), col("n_events"),
        col("z"), col("is_anomaly"))
  }

  /** Sketch twin of `events_hourly`'s per-bucket `count(DISTINCT user)`
    * for the scale where the exact form is itself the bottleneck: exact
    * distinct-per-group plans an Expand that shuffles every (bucket,
    * user) pair — at 100 TB of events that exchange carries the table.
    * This is ONE combinable pass instead: each task folds its rows into
    * fixed-size HyperLogLog++ sketches (one per live bucket), merge is
    * sketch-union. NOT oracle-matchable by construction (estimates are
    * engine-specific); agreement with the exact form is pinned within
    * rsd tolerance in AsOfEventsSpec — the same twin contract as
    * [[graft.operators.Profile.columnProfileApprox]]. */
  def hourlyUsersApprox(events: DataFrame, userCol: String,
                        tsCol: String = "ts",
                        rsd: Double = 0.05): DataFrame =
    events
      .groupBy(expr(s"`$tsCol` div 3600000000000").as("hour_bucket"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col(userCol), rsd).as("n_users_est"))
}
