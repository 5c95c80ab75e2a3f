package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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
