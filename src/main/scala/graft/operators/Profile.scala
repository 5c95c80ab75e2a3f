package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

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

  /** EXACT heavy hitters — every key whose count strictly exceeds
    * `total/m` — without ever shuffling the full key space. Two passes:
    *
    *  1. a NARROW Misra-Gries sketch pass (`mapPartitions`, capacity `m`
    *     counters per partition, no shuffle): any key with global count
    *     > n/m must have partition count > n_p/m in at least one
    *     partition (pigeonhole over Σf_p = f > Σn_p/m), and capacity-m
    *     Misra-Gries keeps every key with partition count > n_p/(m+1) ⊇
    *     that — so the union of per-partition survivors is a GUARANTEED
    *     superset of the answer, at most m·P candidate rows (the same
    *     pass also counts each partition's rows, so the grand total
    *     costs no extra scan);
    *  2. an exact confirm: broadcast the candidate set, semi-join the
    *     table to it (map-side combined count over ≤ m·P keys), and keep
    *     keys with `n·m > total` — exact integer comparison, no
    *     division, so the oracle matches on any engine.
    *
    * [[hotKeys]] shuffles every distinct key to rank the top-k; at
    * 100 TB with billions of distinct keys that exchange IS the cost,
    * and this sketch path replaces it with one narrow scan plus a
    * candidate-only aggregate whose shuffle is bounded by m·P rows
    * regardless of data volume. NULL keys count as a key (matching the
    * oracle's GROUP BY) via a null-safe candidate join. */
  def heavyHitters(df: DataFrame, keyCol: String, m: Int): DataFrame = {
    require(m >= 2, "m must be >= 2")
    val keyDf = df.select(col(keyCol))
    // the sentinel row carries a null key even over a non-nullable column
    val outSchema = StructType(keyDf.schema.fields.map(_.copy(nullable = true)) ++ Seq(
      StructField("_s", BooleanType, nullable = false),
      StructField("_pn", LongType, nullable = false)))
    val sketch = keyDf.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[Any, Long]
      var nPart = 0L
      it.foreach { row =>
        val k = row.get(0)
        nPart += 1L
        counters.get(k) match {
          case Some(c) => counters.update(k, c + 1L)
          case None if counters.size < m => counters.update(k, 1L)
          case None =>
            // decrement-all step: amortized O(1) per input row (each
            // such step retires m+1 previously-added count units)
            val dead = counters.iterator.collect { case (kk, 1L) => kk }.toList
            counters.mapValuesInPlace((_, c) => c - 1L)
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator.map(k => Row(k, false, 0L)) ++
        Iterator.single(Row(null, true, nPart))
    }(Encoders.row(outSchema)).localCheckpoint()
    val cand = sketch.where(!col("_s"))
      .select(col(keyCol).as("_hk")).distinct()
    val total = sketch.where(col("_s"))
      .agg(coalesce(sum("_pn"), lit(0L)).as("tot"))
    df.join(broadcast(cand), col(keyCol) <=> col("_hk"))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") * m > col("tot"))
      .select(col(keyCol), col("n"))
      .orderBy(desc("n"), asc_nulls_last(keyCol))
  }

  /** EXACT nearest-rank percentiles of an integer column per group —
    * `p`-th percentile = the value at ascending rank `ceil(p·n/100)`
    * (= `(p·n + 99) div 100` in pure integer arithmetic, so the rank —
    * and the value read at it — is bit-identical on any engine; the
    * interpolated definition every builtin `percentile` uses multiplies
    * doubles and reopens the cross-engine rounding doctrine).
    * Duplicate values make `row_number` assignment among equals
    * engine-arbitrary, but the VALUE at sorted position r of a multiset
    * is well-defined regardless — only values are emitted. NULL values
    * cannot rank and are excluded (both engines).
    *
    * Shape: one group-keyed sort window over the value column (the
    * grouped sort IS the cost). For unbounded/skewed groups swap in a
    * sketch ([[graft.operators.TextAnalysis]]'s approx-percentile twin
    * doctrine) or a two-pass rank prefix ([[graft.operators.Shards]]'
    * prefix-count machinery) — exactness here is what makes the oracle
    * exact. */
  def percentileBands(df: DataFrame, groupCol: String, valueCol: String,
                      ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be in 1..100")
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, LongType)
        .contains(df.schema(valueCol).dataType),
      s"valueCol must be integral, got ${df.schema(valueCol).dataType}")
    val ranked = df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("_v"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(groupCol).orderBy("_v")))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = ps.map(p =>
      max(when(col("_rn") === expr(s"($p * _n + 99) div 100"), col("_v")))
        .as(s"p$p"))
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Referential-integrity audit: how many child rows reference no
    * parent — the pre-join data-quality number a pipeline checks before
    * trusting an equi-join (a silently-broken FK turns inner joins into
    * row loss). NULL child keys count as orphans (they can reference
    * nothing — same rows an inner join would drop). ONE keyed left
    * join (AQE broadcasts the deduped parent-key set while small, else
    * the shuffle join the check would need anyway) + one combinable
    * aggregate; output is a single (n_child, n_orphans) row. */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as("_pk"))
      .where(col("_pk").isNotNull).distinct()
    child.select(col(childKey).as("_ck2"))
      .join(keys, col("_ck2") === col("_pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        // coalesce: sum over an EMPTY child is NULL, which would read
        // as "unknown" (and NPE a getLong) instead of "no orphans"
        coalesce(sum(col("_pk").isNull.cast("long")), lit(0L)).as("n_orphans"))
  }

  /** Per-group KL divergence of a class distribution from the corpus
    * distribution — the mixing diagnostic ("how unlike the corpus is
    * this source's language profile") that decides reweighting before
    * export. KL(P_g ‖ Q) = Σ_c p ln(p/q) with p = n_gc/n_g,
    * q = n_c/N, computed on the library's exact grids: each class term
    * micro-quantizes `ln((n_gc·N)/(n_g·n_c))` with floor (the IDENTICAL
    * IEEE double expression on both engines feeds ln), the weighted sum
    * Σ n_gc·t6 accumulates in decimal(38,0)/HUGEINT (exact at any
    * count scale), and the 1/n_g normalization floors the exact integer
    * (micro-grid result can be slightly negative — quantization noise
    * around 0 for a group matching the corpus exactly; floor is
    * sign-safe where integer div is not).
    *
    * Shape: ONE corpus scan into the (group, class) count table, which
    * MATERIALIZES (localCheckpoint — |groups|·|classes| rows, report-
    * sized) so the three marginals derive from it without re-scanning;
    * everything after is report-scale joins. */
  def klDivergence(df: DataFrame, groupCol: String,
                   classCol: String): DataFrame = {
    val clash = Seq("n_gc", "n_g", "n_c", "n", "w", "sw", "n_docs", "kl6")
      .filter(Seq(groupCol, classCol).contains)
    require(clash.isEmpty, s"columns collide with KL working names: $clash")
    val c = df.groupBy(col(groupCol), col(classCol))
      .agg(count(lit(1)).as("n_gc")).localCheckpoint()
    val g = c.groupBy(groupCol).agg(sum("n_gc").as("n_g"))
    val k = c.groupBy(classCol).agg(sum("n_gc").as("n_c"))
    val tot = c.agg(sum("n_gc").as("n"))
    val t6 = floor(log((col("n_gc").cast("double") * col("n")) /
      (col("n_g").cast("double") * col("n_c"))) * lit(1e6)).cast("long")
    c.join(g, groupCol).join(k, classCol).crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_g"),
        (col("n_gc").cast("decimal(38,0)") * t6).as("w"))
      .groupBy(groupCol, "n_g").agg(sum("w").as("sw"))
      .select(col(groupCol), col("n_g").as("n_docs"),
        floor(col("sw").cast("double") / col("n_g")).cast("long").as("kl6"))
  }

  /** Multi-grain rollup report in ONE pass: count + value sum at every
    * prefix grain of `grainCols` (finest → grand total), the report face
    * of `GROUP BY ROLLUP`. Spark plans this as a single scan through an
    * `Expand` (one replicated row per grain) into ONE combinable
    * aggregate — at 100 TB that is strictly cheaper than the G separate
    * groupBy passes it replaces (G× fewer scans; the Expand fan-out is
    * map-side and partially aggregated before the only exchange).
    * `gid` is the SQL-standard grouping bitmask (first grain column =
    * MSB — identical in DuckDB's `GROUPING(...)`), which disambiguates a
    * rolled-up placeholder from a genuine null key; display columns are
    * coalesced to `(all)` so the report carries no nulls at all (and no
    * cross-engine null-ordering hazard). */
  def rollupGrains(df: DataFrame, grainCols: Seq[String],
                   valueCol: String): DataFrame = {
    require(grainCols.nonEmpty, "need at least one grain column")
    val disp = grainCols.map(c => coalesce(col(c), lit("(all)")).as(c))
    df.rollup(grainCols.map(col): _*)
      .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"))
      .select(disp :+ col("gid") :+ col("n") :+ col("sum_v"): _*)
  }

  /** Equi-width histogram of an integral column over its OWN min/max
    * range — all-integer bucket arithmetic so any engine computes the
    * identical assignment: `bucket = (v - lo) * nb / (hi - lo + 1)`
    * (non-negative operands, so floor-division and truncation agree —
    * the library's integer-grid doctrine; the +1 denominator pins the
    * maximum into bucket nb-1 and makes a constant column one bucket-0
    * bar instead of a division by zero). Two passes: a 2-long bounds
    * aggregate (tiny, broadcast) and ONE combinable count keyed by ≤nb
    * buckets — the exchange is nb rows wide regardless of data scale.
    * Caller's domain must satisfy (hi-lo)·nb < 2^63 (true for any
    * real-world measure column; runtime-guarded — a wider span, e.g.
    * epoch NANOSECONDS, raises instead of silently wrapping the long
    * multiply into garbage buckets). Null values are excluded; empty
    * input yields an empty histogram. */
  def histogram(df: DataFrame, valueCol: String, nb: Int = 20): DataFrame = {
    require(nb >= 1, "need at least one bucket")
    val v = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"))
    val bounds = v.agg(min("_v").as("_lo"), max("_v").as("_hi"))
    v.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("_hi") - col("_lo") >= lit(Long.MaxValue / nb),
          raise_error(lit(s"histogram: value span * $nb overflows long — " +
            "rescale the column (e.g. ns -> hours) or lower nb")).cast("long"))
          .otherwise(expr(s"((_v - _lo) * $nb) div (_hi - _lo + 1)")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("_v").as("min_v"), max("_v").as("max_v"))
  }

  /** EXACT GLOBAL nearest-rank percentiles of an integral column — the
    * whole-table twin of [[percentileBands]] whose naive form
    * (`row_number() OVER (ORDER BY v)`) is a SinglePartition window:
    * one task sorting 100 TB. This is the two-pass prefix-count shape
    * instead ([[graft.operators.Shards.shuffleOrder]]'s machinery
    * applied to rank SELECTION): range-exchange on the value, snapshot
    * the cuts, collect the W per-partition counts (bounded by the
    * exchange width, never data-scale), convert each requested rank to
    * (partition, local index) on the driver, and read exactly those
    * rows with a per-partition window. Output is ONE row of `p<N>`
    * columns (an empty/all-null input yields one all-null row — the
    * oracle's aggregate-over-empty semantics). */
  def percentileGlobal(df: DataFrame, valueCol: String,
                       ps: Seq[Int] = Seq(50, 90, 99),
                       width: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be in 1..100")
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, LongType)
        .contains(df.schema(valueCol).dataType),
      s"valueCol must be integral, got ${df.schema(valueCol).dataType}")
    val spark = df.sparkSession
    val w = Shards.rangeWidth(spark, width)
    // snapshot after the exchange: range boundaries are sampled, so the
    // counts pass and the selection pass must see the SAME cuts
    val ranged = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"))
      .repartitionByRange(w, col("_v"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    // rank → (partition, local index): walk the bounded offset table
    val offsets = counts.scanLeft(0L)(_ + _._2) // rows before partition i
    val targets = ps.flatMap { p =>
      if (total == 0L) None
      else {
        val rank = (p.toLong * total + 99L) / 100L // ceil, positive operands
        val i = counts.indices.find(i => rank <= offsets(i) + counts(i)._2).get
        Some((counts(i)._1, rank - offsets(i), p))
      }
    }
    import spark.implicits._
    val tDf = targets.toDF("_pid", "_lrn", "_p")
    val hits = ranged
      .withColumn("_lrn", row_number().over(
        Window.partitionBy("_pid").orderBy("_v")).cast("long"))
      .join(broadcast(tDf), Seq("_pid", "_lrn"))
    val aggs = ps.map(p => max(when(col("_p") === p, col("_v"))).as(s"p$p"))
    hits.groupBy().agg(aggs.head, aggs.tail: _*)
  }

  /** Per-column integrity profile: null count and exact distinct
    * cardinality, one output row per requested column. ONE aggregation
    * pass (Spark plans the multiple distinct aggregates through a
    * single expand — no per-column scans), then a literal unpivot of
    * the 1-row result. Exact distincts keep the oracle exact; swap in
    * `approx_count_distinct` at scales where cardinality itself is the
    * bottleneck (the profile is then sketch-accurate, not
    * oracle-matchable). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** [[columnProfile]]'s sketch twin for the scale where exact distinct
    * cardinality is itself the bottleneck (a multi-distinct expand over
    * billions of distinct values shuffles every distinct value): each
    * cardinality is a HyperLogLog++ estimate at `rsd` relative standard
    * deviation — fixed sketch memory per column, one combinable pass,
    * no expand. Null counts stay exact. NOT oracle-matchable by
    * construction (estimates are engine-specific); agreement with the
    * exact form is pinned within tolerance in AsOfEventsSpec. */
  def columnProfileApprox(df: DataFrame, cols: Seq[String],
                          rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinct: String => org.apache.spark.sql.Column): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"__null_$c"),
        distinct(c).as(s"__dist_$c"))
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
