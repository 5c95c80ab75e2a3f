package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checksum-gated incremental re-index (P4/J4/J6/I1 — the reference's whole
  * re-ingest story: mcp_server/apps/embeddings.py:139-144, fts.py:139-181).
  * In Spark the checksum cache IS the previous table state, and "skip
  * unchanged" is one anti-join — no per-row driver loop.
  */
object Incremental {

  /** P4/J4: rows of `fresh` whose (id, checksum) is NOT in `prev` —
    * i.e. new or modified documents needing re-index. */
  def changed(fresh: DataFrame, prev: DataFrame, idCol: String,
              checksumCol: String): DataFrame =
    fresh.join(prev.select(col(idCol), col(checksumCol)),
      Seq(idCol, checksumCol), "left_anti")

  /** J6: last-writer-wins upsert — keep old rows not superseded, union the
    * new batch (the anti-join + unionByName rewrite of Chroma/SQLite
    * upserts; no transactional table format in scope). */
  def upsert(prev: DataFrame, batch: DataFrame, idCol: String): DataFrame =
    prev.join(batch.select(idCol), Seq(idCol), "left_anti").unionByName(batch)
}
