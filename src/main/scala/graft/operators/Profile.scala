package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling operators — the pre-ingest inspection pass a pipeline
  * runs on every new batch before it touches the expensive stages:
  * which keys are hot (the input to every salting/bucketing decision in
  * this library — the audit face of the `capBuckets`/hot-shingle guards),
  * and per-column integrity (null share, distinct cardinality) so schema
  * drift and broken extractors surface as numbers, not downstream
  * mysteries.
  */
object Profile {

  /** Top-k hottest keys with their share of the table — ONE combinable
    * count keyed by the key columns, a 1-row total attach (the
    * corpus-stats broadcast pattern), and a TakeOrdered top-k. Ties
    * break by the key itself (NULLS LAST, matching DuckDB's default
    * null order so a null hot key at the k-boundary cannot diverge from
    * the oracle), so the report is deterministic. At 100 TB this is the
    * cheapest possible skew probe: ONE map-side-combined scan of the
    * table — the per-key counts are materialized once
    * (localCheckpoint), and both the grand total (Σn over the already
    * aggregated |keys| rows) and the top-k read that materialization
    * instead of re-scanning df. */
  def hotKeys(df: DataFrame, keyCols: Seq[String], k: Int = 10): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val total = counts.agg(sum("n").as("tot"))
    counts.crossJoin(broadcast(total))
      // share floors onto the 1e-6 grid (never round-half: a count
      // ratio can sit exactly on the .5 boundary, where engines
      // disagree on the same double — the library's rounding doctrine)
      .select(keyCols.map(col) :+ col("n") :+
        (floor(col("n").cast("double") / col("tot") * 1e6) / 1e6).as("share"): _*)
      .orderBy(desc("n") +: keyCols.map(c => asc_nulls_last(c)): _*)
      .limit(k)
  }

  /** Per-column integrity profile: null count and exact distinct
    * cardinality, one output row per requested column. ONE aggregation
    * pass (Spark plans the multiple distinct aggregates through a
    * single expand — no per-column scans), then a literal unpivot of
    * the 1-row result. Exact distincts keep the oracle exact; swap in
    * `approx_count_distinct` at scales where cardinality itself is the
    * bottleneck (the profile is then sketch-accurate, not
    * oracle-matchable). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.map { c =>
      struct(lit(c).as("column"), col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"))
    }: _*)
    row.select(explode(entries).as("p"))
      .select(col("p.column").as("column"), col("p.n_null").as("n_null"),
        col("p.n_distinct").as("n_distinct"))
  }
}
