package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape utilities for skewed keys. [[graft.operators.Profile.hotKeys]]
  * is the audit input that tells you WHEN to reach for these.
  */
object Joins {

  /** Skew-spreading salted inner equi-join — row-identical to
    * `facts.join(dim, keyCol)` (property-pinned in AsOfEventsSpec), but
    * the exchange is keyed by (key, salt) so ONE viral key's fact rows
    * spread over `nSalt` tasks instead of pinning a single reducer.
    * Facts get `salt = pmod(xxhash64(all fact columns), nSalt)` (any
    * per-row spread works — the join result is salt-independent because
    * each fact row meets exactly the one replica of each matching dim
    * row that carries its salt); the dim side replicates ×nSalt.
    *
    * When to use instead of the alternatives, at 100 TB:
    *  - `broadcast(dim)` beats this whenever dim fits an executor —
    *    salting is for the regime where it does not;
    *  - AQE's skew-join split only kicks in for sort-merge joins AFTER
    *    the skewed shuffle has already written one oversized map
    *    output per hot key; salting prevents the hot partition from
    *    forming at all, works under any join strategy, and composes
    *    with follow-up per-key aggregation (aggregate partial results
    *    per (key, salt), then re-reduce per key).
    *
    * Cost: dim shuffle volume ×nSalt — size `nSalt` from the hot-key
    * profile (≈ hottest key's row count / target rows per task), not
    * larger. NULL fact keys never match an inner join, and xxhash64
    * handles null columns, so null handling is inherited untouched. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
                 nSalt: Int): DataFrame = {
    require(nSalt >= 1, "nSalt must be >= 1")
    val fCols = facts.columns.toSeq
    val overlap = (fCols.toSet intersect dim.columns.toSet) - keyCol
    require(overlap.isEmpty, s"non-key column collision: $overlap")
    require(!fCols.contains("_salt") && !dim.columns.contains("_salt"),
      "a column named _salt collides with the internal salt column")
    val sf = facts.withColumn("_salt",
      pmod(xxhash64(fCols.map(col): _*), lit(nSalt.toLong)))
    val sd = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalt.toLong - 1L))))
    sf.join(sd, Seq(keyCol, "_salt")).drop("_salt")
  }
}
