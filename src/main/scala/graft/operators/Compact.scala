package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every large lake
  * runs continuously: streaming sinks, incremental upserts, and
  * per-partition writers (e.g. [[graft.streaming.Streams.incrementalUpsert]]'s
  * bucket rewrites) accrete files far below the ideal scan unit, and at
  * 100 TB a scan's task count (and the namenode's listing load) is set
  * by FILE count, not byte count. Compaction rewrites a directory into
  * ~targetBytes files, optionally range-clustered so parquet row-group
  * min/max statistics prune point/range scans afterwards.
  */
object Compact {

  final case class CompactStats(files_in: Long, bytes_in: Long,
                                files_out: Long, bytes_out: Long,
                                rows: Long)

  /** Rewrite `inDir` into `outDir` at ~`targetBytes` per file.
    *
    * With `clusterBy` set, the rewrite uses `repartitionByRange` +
    * `sortWithinPartitions` — each output file then covers a disjoint
    * key range, so a later filtered scan prunes whole files/row-groups
    * by footer statistics (the poor man's Z-order; one sort pays for
    * every subsequent scan). Without it, a plain round-robin
    * repartition balances bytes. Sizing reads the CURRENT directory
    * footprint from the file system, not a guess; output file count =
    * ⌈bytes/targetBytes⌉ (compression drift is bounded — the input is
    * already parquet).
    *
    * The rewrite is data-preserving by construction (same rows, new
    * layout) — the registered roundtrip query hash-checks the content
    * against the source-of-truth oracle. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L * 1024 * 1024,
                     clusterBy: Seq[String] = Nil): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (filesIn, bytesIn) = dirStats(spark, inDir)
    val nOut = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val out =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(nOut, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else df.repartition(nOut)
    out.write.mode("overwrite").parquet(outDir)
    val rows = spark.read.parquet(outDir).count()
    val (filesOut, bytesOut) = dirStats(spark, outDir)
    CompactStats(filesIn, bytesIn, filesOut, bytesOut, rows)
  }

  /** Morton (Z-order) interleave of two non-negative coordinates' low
    * `bits` bits: bit i of `a` lands at output bit 2i, bit i of `b` at
    * 2i+1 — a pure builtin column expression (shift/and/or fold, stays
    * inside whole-stage codegen), no UDF. Sorting by the z-value makes
    * rows close in BOTH dimensions file-neighbors, which single-key
    * range clustering cannot (the second key's min/max spans the whole
    * domain in every file). Inputs must already lie in [0, 2^bits) —
    * [[compactParquetZOrder]] normalizes arbitrary columns first. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in 1..31")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
        .bitwiseOR(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }
  }

  /** [[compactParquet]]'s two-dimensional layout twin: rewrite clustered
    * by the Z-order curve over (`colA`, `colB`) so a later scan filtered
    * on EITHER column (or both) prunes files by footer min/max — the
    * data-layout optimization single-key range clustering cannot give
    * (its second key is unsorted inside every file). The pipeline use:
    * a corpus scanned both by source and by time, or embeddings shards
    * probed by (centroid, shard).
    *
    * Normalization: each column maps to [0, 2^bits) via `width_bucket`
    * between its own min/max (ONE tiny agg job; uniform value-width
    * buckets, the cheap stand-in for Delta-style sampled range ids — a
    * heavily value-skewed column degrades bucket BALANCE but never
    * correctness, and the range exchange still balances ROW counts by
    * sampling the z-values). The z column is computed, range-clustered
    * on, and dropped — the written schema is unchanged. At 100 TB this
    * is one narrow pass + one range exchange, the same cost shape as
    * the single-key path. */
  def compactParquetZOrder(spark: SparkSession, inDir: String, outDir: String,
                           colA: String, colB: String,
                           targetBytes: Long = 128L * 1024 * 1024,
                           bits: Int = 8): CompactStats = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (filesIn, bytesIn) = dirStats(spark, inDir)
    val nOut = math.max(1L, (bytesIn + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val bounds = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    def bound(i: Int): Option[Double] =
      if (bounds.isNullAt(i)) None else Some(bounds.getDouble(i))
    val n = 1L << bits
    // width_bucket has Postgres semantics: v == hi lands in bucket n+1
    // and v < lo in bucket 0 — clamp into [0, 2^bits) and send NULLs to
    // 0 so every row gets a valid z coordinate. A column with no
    // comparable values (empty input, all NULL, casts to null) or a
    // constant column collapses to coordinate 0 — the rewrite then
    // degrades to the other dimension's ordering instead of crashing.
    def coord(c: String, lo: Option[Double], hi: Option[Double]): Column =
      (lo, hi) match {
        case (Some(l), Some(h)) if l < h =>
          coalesce(greatest(least(
            width_bucket(col(c).cast("double"), lit(l), lit(h), lit(n)) - lit(1L),
            lit(n - 1L)), lit(0L)), lit(0L))
        case _ => lit(0L)
      }
    val z = zValue(coord(colA, bound(0), bound(1)),
      coord(colB, bound(2), bound(3)), bits)
    Layout.clusteredWriteByKey(df, z, outDir, nOut)
    val rows = spark.read.parquet(outDir).count()
    val (filesOut, bytesOut) = dirStats(spark, outDir)
    CompactStats(filesIn, bytesIn, filesOut, bytesOut, rows)
  }

  /** (data file count, total bytes) of a directory tree's non-hidden
    * files — RECURSIVE, so hive-partitioned layouts (`date=…/part-*`)
    * size correctly (a flat listing would see 0 files and collapse the
    * whole rewrite into one output partition). */
  private def dirStats(spark: SparkSession, dir: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0L
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      // skip hidden data and anything under a hidden dir (_temporary)
      val hidden = st.getPath.toString.split('/')
        .exists(s => s.startsWith("_") || (s.startsWith(".") && s.length > 1))
      if (!hidden && !n.startsWith("_") && !n.startsWith(".")) {
        files += 1; bytes += st.getLen
      }
    }
    (files, bytes)
  }
}
