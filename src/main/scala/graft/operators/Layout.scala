package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file-layout clustering — the data-skipping story
  * for 100 TB scans the reference never needed (its corpus fits one
  * process) but a lakehouse-scale corpus lives or dies by: lay rows out
  * so that EVERY dimension of a multi-column filter concentrates its
  * matches in few files, and a min/max-pruning reader (parquet
  * row-group stats, Delta/Iceberg file stats, Spark's own parquet
  * filter pushdown) skips the rest. A single-column sort gives perfect
  * pruning on one dimension and none on the others; the Z-order
  * (Morton) curve interleaves the dimensions' bits so each file's
  * bounding box is small in BOTH — the layout Delta's `OPTIMIZE ZORDER
  * BY` and Iceberg's sort orders implement.
  *
  * Everything here is pure column arithmetic (shifts + masks, unrolled
  * at plan-build time — no UDF, fully codegen), so the key is
  * SQL-replayable and the registered `zorder_key` row oracle-gates the
  * exact bit interleave.
  */
object Layout {

  /** Z-order (Morton) key over two non-negative integer columns, `bits`
    * bits each: bit k of `a` lands at position 2k, bit k of `b` at
    * 2k+1. Inputs are masked to `bits` low bits first (callers scale
    * their dimensions onto the grid; out-of-grid high bits must not
    * silently reorder distant rows). NEGATIVE inputs are out of domain
    * and the mask does NOT fix them: two's-complement low bits scatter
    * a negative value onto an arbitrary grid cell (e.g. −1 masks to
    * all-ones — the far corner), so a caller with signed dimensions
    * must shift/clamp them non-negative BEFORE keying — a silent
    * clamp here would merge distinct negative values onto cell 0 and
    * change the oracle-pinned masked semantics; the interleave itself is the ONE
    * shared [[Compact.zValue]] fold — static shift/mask terms,
    * whole-stage-codegen friendly, exact on the integer grid (≤ 62
    * result bits), and replayable verbatim in SQL. This masked form is
    * the `zorder_key` oracle contract; [[Compact.compactParquetZOrder]]
    * feeds the same fold width_bucket-normalized coordinates instead. */
  def zorderKey2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    Compact.zValue(a.cast("long").bitwiseAND(lit(mask)),
      b.cast("long").bitwiseAND(lit(mask)), bits)
  }

  /** Range-cluster `df` on an arbitrary layout key and write `nFiles`
    * parquet files, each internally sorted by the key — the ONE
    * layout-write core [[clusteredWrite]] and
    * [[Compact.compactParquetZOrder]] share. `repartitionByRange`
    * samples the key to place boundaries, so file CONTENTS are layout
    * policy, not query semantics — nothing downstream may depend on
    * file identity. */
  def clusteredWriteByKey(df: DataFrame, key: Column, path: String,
                          nFiles: Int): Unit = {
    require(!df.columns.contains("__zkey"),
      "a column named __zkey collides with the internal layout key")
    df.withColumn("__zkey", key)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` clustered on the Z-order of (`aCol`, `bCol`): range-
    * partition by the interleaved key into `nFiles` files, sort within
    * each, drop the key. Each output file then covers a small bounding
    * box in BOTH dimensions (measure with [[fileSpans]]), which is what
    * lets a stats-pruning reader skip files for any box filter. At
    * cluster scale this is the compaction job's layout pass: one range
    * shuffle, no driver state. */
  def clusteredWrite(df: DataFrame, aCol: String, bCol: String,
                     path: String, nFiles: Int, bits: Int = 16): Unit =
    clusteredWriteByKey(df, zorderKey2(col(aCol), col(bCol), bits),
      path, nFiles)

  /** Per-file bounding boxes of two dimensions over a written layout —
    * the min/max stats a pruning reader consults, surfaced as a frame:
    * (file, min_a, max_a, min_b, max_b). The quality measure of a
    * clustered layout is Σ box-area / (full-area · n_files) ≪ 1;
    * a row-major (single-dim-sorted) layout scores ~1 on the other
    * dimension. Diagnostic (file names are not stable identifiers). */
  def fileSpans(spark: org.apache.spark.sql.SparkSession, path: String,
                aCol: String, bCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(aCol).as("min_a"), max(aCol).as("max_a"),
        min(bCol).as("min_b"), max(bCol).as("max_b"))
}
