package graft.operators

import org.apache.spark.sql.DataFrame
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
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String, rightCols: Seq[String],
               toleranceNs: Option[Long] = None,
               prefix: String = "asof_"): DataFrame = {
    val payload = Seq(tsCol, tieCol) ++ rightCols.filterNot(c => c == tsCol || c == tieCol)
    val leftCols = left.columns.toSeq
    val r = right.select(
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
}
