package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the windowed rollups in
  * [[graft.streaming.Streams]]: volume-anomaly scoring over the hourly
  * series. The data-pipeline use is ingest monitoring — a scrape source
  * whose hourly document volume spikes or collapses (bot storm, silent
  * outage) should be flagged before its batch enters the training mix.
  */
object Events {

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
  def hourlyAnomalies(events: DataFrame, seriesCol: String,
                      tsCol: String = "ts",
                      zFlag: Double = 3.0): DataFrame = {
    val hourly = events
      .groupBy(expr(s"`$tsCol` div 3600000000000").as("hour_bucket"), col(seriesCol))
      .agg(count("*").as("n_events"))
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
}
