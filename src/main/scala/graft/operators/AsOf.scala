package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, attach the LATEST right
  * row with `right.ts <= left.ts` within the same key. The operator the
  * builder brief names as one Spark lacks natively; the classic use is
  * event attribution (each purchase credited to the user's most recent
  * prior page view) and point-in-time feature lookup (each training row
  * reads the freshest feature value as of its timestamp — no leakage from
  * the future).
  *
  * Implementation is the scalable union+window formulation, NOT a range
  * join: tag both sides, union, and run ONE window per key ordered by
  * (ts, side, tie) carrying `last(right_payload, ignoreNulls)` — each left
  * row then holds exactly the latest right row at-or-before it. Cost is a
  * single shuffle of both inputs on the key and a per-key sort: no
  * range-predicate explosion (a naive `l.key=r.key AND r.ts<=l.ts` join
  * materializes O(|L|·|R|) pairs per key before picking the max), no
  * per-key collect, no broadcast requirement on either side. At 100 TB
  * both sides stream through the same hash partitioning; a single hot key
  * degrades to one task's sort, in which case pre-bucket the timeline
  * (coarse time buckets carrying each bucket's closing right-row forward)
  * before the window — the semantics compose because "latest at-or-before"
  * is a running fold.
  *
  * Tie rules (part of the contract, mirrored by the DuckDB oracle):
  * right rows sort BEFORE left rows at an identical timestamp (`<=`
  * semantics — a same-instant right row is visible), and among right rows
  * sharing a timestamp the one with the highest `tieCol` wins.
  */
object AsOf {

  /** Join `left` to the latest `right` row at-or-before each left row.
    *
    * @param left       probe side; ALL its columns pass through
    * @param right      reference side
    * @param keyCol     equi-key present on both sides
    * @param tsCol      ordering column present on both sides (any ordered
    *                   type; the test tables use epoch-nanos longs)
    * @param tieCol     total-order tie-break among right rows with equal ts
    * @param rightCols  right payload columns to attach (each emitted as
    *                   `prefix+name`, NULL when no right row qualifies)
    * @param toleranceNs optional max allowed `left.ts - right.ts`; matches
    *                   staler than this are nulled out (common in feature
    *                   lookup: a quote older than the horizon is no quote)
    * @param prefix     prefix for the attached right columns
    *
    * Null semantics match a range join's: right rows with a NULL key or
    * NULL ts can never satisfy `r.key = l.key AND r.ts <= l.ts` and are
    * dropped up front (unfiltered they would sort nulls-first inside the
    * window and masquerade as everyone's oldest match); left rows with a
    * NULL key simply never match.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String, rightCols: Seq[String],
               toleranceNs: Option[Long] = None,
               prefix: String = "asof_"): DataFrame = {
    val payload = Seq(tsCol, tieCol) ++ rightCols.filterNot(c => c == tsCol || c == tieCol)
    val leftCols = left.columns.toSeq
    val r = right.where(col(keyCol).isNotNull && col(tsCol).isNotNull).select(
      col(keyCol), col(tsCol), col(tieCol), lit(0).as("_side"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("_l"),
      struct(payload.map(col): _*).as("_r"))
    val l = left.select(
      col(keyCol), col(tsCol), col(tieCol), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(r.schema("_r").dataType).as("_r"))
    // rowsBetween(unboundedPreceding, currentRow) + ignoreNulls last():
    // the running "latest right row seen so far" fold
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("_r"), ignoreNulls = true).over(w)
    val matched = toleranceNs match {
      case Some(tol) =>
        when(col(tsCol) - matchedRaw.getField(tsCol) <= tol, matchedRaw)
      case None => matchedRaw
    }
    val joined = r.unionByName(l)
      .withColumn("_m", matched)
      .where(col("_side") === 1)
    val out = leftCols.map(c => col("_l").getField(c).as(c)) ++
      payload.map(c => col("_m").getField(c).as(prefix + c))
    joined.select(out: _*)
  }

  /** The hot-key scale path for [[asofJoin]] — identical semantics,
    * partitioned at (key, time-bucket) granularity instead of (key), so
    * ONE dominant key (a whole-market price feed, a global config
    * stream) spreads across `timeline/bucketWidth` tasks instead of
    * pinning one task's sort. Two stages, both keyed by (key, bucket):
    *
    *  1. within-bucket: the same union+window fold, windowed over
    *     (key, bucket) — finds each left row's latest right row in its
    *     OWN bucket;
    *  2. carry-forward: each bucket's CLOSING right row (`max_by` on the
    *     (ts, tie) ordering key — one row per (key, bucket))
    *     is folded along the key's bucket sequence so every left bucket
    *     knows the latest right row from all EARLIER buckets; rows whose
    *     within-bucket leg found nothing fall back to it.
    *
    * The fold in stage 2 runs over ≤ #distinct-(key,bucket) rows, not
    * data-scale rows, so its per-key window is bounded by the timeline
    * resolution. Output is row-identical to [[asofJoin]] (property-pinned
    * in AsOfEventsSpec); tolerance composes the same way because
    * "latest at-or-before" is a running fold over bucket boundaries. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keyCol: String,
                       tsCol: String, tieCol: String, rightCols: Seq[String],
                       bucketWidth: Long, toleranceNs: Option[Long] = None,
                       prefix: String = "asof_"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val payload = Seq(tsCol, tieCol) ++ rightCols.filterNot(c => c == tsCol || c == tieCol)
    val leftCols = left.columns.toSeq
    val bkt = (c: Column) => floor(c / bucketWidth).cast("long")
    val rPay = struct(payload.map(col): _*)
    // same null doctrine as asofJoin: null-key/null-ts right rows can
    // never satisfy the range predicate — drop before either stage
    val right1 = right.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val r = right1.select(col(keyCol), col(tsCol), col(tieCol),
      bkt(col(tsCol)).as("_b"), lit(0).as("_side"),
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("_l"),
      rPay.as("_r"))
    val l = left.select(col(keyCol), col(tsCol), col(tieCol),
      bkt(col(tsCol)).as("_b"), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(r.schema("_r").dataType).as("_r"))
    // stage 1: the usual fold, but partitioned by (key, bucket)
    val w1 = Window.partitionBy(col(keyCol), col("_b"))
      .orderBy(col(tsCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = r.unionByName(l)
      .withColumn("_m1", last(col("_r"), ignoreNulls = true).over(w1))
      .where(col("_side") === 1)
      .select(col(keyCol), col("_b"), col("_l"), col("_m1"))
    // stage 2: per-(key,bucket) closing right row — max_by over the
    // (ts, tie) ORDERING struct (the same tie contract as the window
    // fold), carrying the payload unordered so non-orderable payload
    // types (maps, …) work exactly as they do in asofJoin's last()
    val closings = right1
      .groupBy(col(keyCol), bkt(col(tsCol)).as("_b"))
      .agg(max_by(rPay, struct(col(tsCol), col(tieCol))).as("_close"))
      .withColumn("_cb", lit(0))
    // fold closings along each key's bucket sequence onto the left's
    // distinct buckets. A left bucket must NOT see its own bucket's
    // closing (that right row may sit after a given left row in time —
    // stage 1 owns the bucket interior), so left bucket-rows order
    // BEFORE closings at the same bucket (_cb -1 vs 0) and the running
    // last() sees strictly-earlier buckets only.
    val leftBuckets = within.select(col(keyCol), col("_b")).distinct()
      .withColumn("_close", lit(null).cast(closings.schema("_close").dataType))
      .withColumn("_cb", lit(-1))
    val w2 = Window.partitionBy(keyCol)
      .orderBy(col("_b"), col("_cb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevClose = closings.unionByName(leftBuckets)
      .withColumn("_prev", last(col("_close"), ignoreNulls = true).over(w2))
      .where(col("_cb") === -1)
      .select(col(keyCol), col("_b"), col("_prev"))
    val mergedRaw = coalesce(col("_m1"), col("_prev"))
    val lts = col("_l").getField(tsCol)
    val merged = toleranceNs match {
      case Some(tol) => when(lts - mergedRaw.getField(tsCol) <= tol, mergedRaw)
      case None => mergedRaw
    }
    val out = leftCols.map(c => col("_l").getField(c).as(c)) ++
      payload.map(c => merged.getField(c).as(prefix + c))
    // null-SAFE key equality: a plain equi-join would drop null-key left
    // rows (asofJoin passes them through with a null match — same here)
    within.as("w").join(prevClose.as("pc"),
        col(s"w.$keyCol") <=> col(s"pc.$keyCol") && col("w._b") === col("pc._b"))
      .select(out: _*)
  }

  /** Interval (range-containment) join: every (probe row, interval) pair
    * with `start <= ts <= end` (both ends inclusive), with no equi-key
    * required — the other range-join Spark lacks natively (window
    * attribution, outage/incident overlap, feature windows). The naive
    * `probe JOIN intervals ON ts BETWEEN start AND end` plans a
    * BroadcastNestedLoopJoin — O(|P|·|I|) comparisons — because Catalyst
    * has no equi-key to hash on.
    *
    * This is the bucketed decomposition instead: each interval EXPLODES
    * to the time buckets it covers (`sequence(start div W, end div W)`),
    * each probe row lands in exactly ONE bucket (`ts div W`), and the
    * pair space collapses to a hash equi-join on the bucket id plus the
    * exact range residual-filter. Truncating division is monotonic for
    * positive W, so `start <= ts <= end` implies the bucket ids align —
    * no pair is lost — and the single probe bucket means no pair is
    * DUPLICATED, so no distinct pass is needed.
    *
    * Scale: the shuffle is keyed by time bucket — probe side moves once;
    * interval replication is `span/W + 1` rows each, so pick `W` near
    * the median interval span (replication ~2× while keeping bucket
    * fan-in low). An interval spanning more than
    * `maxBucketsPerInterval` buckets FAILS the job with a clear error
    * instead of silently exploding (a Long.MaxValue "open end" sentinel
    * at seconds grain would otherwise ask `sequence` for ~10⁹ elements
    * and die opaquely, or straggle one task with millions of replicas) —
    * clamp open-ended intervals to the probe's ts range, or widen `W`,
    * before joining. Null or inverted intervals and null-ts probes match
    * nothing and drop up front (range-predicate semantics, same
    * doctrine as [[asofJoin]]).
    *
    * @param probe    probe side; ALL its columns pass through
    * @param intervals frame holding `startCol`/`endCol` long bounds
    * @param ivCols   interval payload columns to attach to each match
    * @param bucketWidth time-bucket width in the ts unit (e.g. ns)
    * @param maxBucketsPerInterval replication bound per interval; an
    *                 interval over it raises rather than explodes
    */
  def intervalJoin(probe: DataFrame, intervals: DataFrame, tsCol: String,
                   startCol: String, endCol: String, bucketWidth: Long,
                   ivCols: Seq[String],
                   maxBucketsPerInterval: Int = 1 << 20): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val ivPayload = Seq(startCol, endCol) ++
      ivCols.filterNot(c => c == startCol || c == endCol)
    val clash = (ivPayload :+ "_b").toSet.intersect(probe.columns.toSet)
    require(clash.isEmpty, s"interval columns collide with probe columns: $clash")
    val sb = expr(s"`_iv_$startCol` div $bucketWidth")
    val eb = expr(s"`_iv_$endCol` div $bucketWidth")
    val iv = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .select(ivPayload.map(c => col(c).as(s"_iv_$c")): _*)
      .withColumn("_b", explode(sequence(sb, {
        val err = raise_error(concat(
          lit(s"intervalJoin: interval spans > $maxBucketsPerInterval " +
            s"buckets at width $bucketWidth (start="),
          col(s"_iv_$startCol"), lit(", end="), col(s"_iv_$endCol"),
          lit(") — clamp open-ended intervals or widen bucketWidth")))
        when(eb - sb >= maxBucketsPerInterval.toLong, err.cast("long"))
          .otherwise(eb)
      })))
    val p = probe.where(col(tsCol).isNotNull)
      .withColumn("_b", expr(s"`$tsCol` div $bucketWidth"))
    p.join(iv, Seq("_b"))
      .where(col(tsCol) >= col(s"_iv_$startCol") &&
        col(tsCol) <= col(s"_iv_$endCol"))
      .select(probe.columns.toSeq.map(col) ++
        ivPayload.map(c => col(s"_iv_$c").as(c)): _*)
  }
}
