package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6/S7/S8: the reference's scraper-side ETL, re-expressed Spark-first
  * (reference: sunnah_scraper/http.py:19-63 rate-limited retrying GET,
  * sunnah_scraper/storage.py:33-35 raw snapshot sink,
  * quran_scraper/scrape_ibn_kathir.py:229-287 paged crawl with
  * checkpoint/resume).
  *
  * The zero-egress build cannot open sockets, so TRANSPORT is a
  * pluggable serializable function and the tests inject deterministic
  * fakes — but every engine-side shape is real: a per-partition token
  * interval limiter with exponential backoff (S7 — the standard Spark
  * decomposition: executor-local limiters, global rate = partitions ×
  * per-partition rate), a key-partitioned raw-payload sink (S6), and a
  * driver-side resumable cursor crawl with an atomic file checkpoint
  * (S8 — the cursor space is tiny; the fetched payloads are the data).
  */
object Scrape {

  /** Left(status) on failure, Right(body) on success. */
  type Fetch = String => Either[Int, String]

  /** Retryable statuses (reference: scrape_ibn_kathir.py RETRYABLE_STATUS). */
  val RetryableStatus: Set[Int] = Set(408, 425, 429, 500, 502, 503, 504)

  final case class FetchResult(url: String, body: Option[String],
                               status: Int, attempts: Int)

  /** S7: rate-limited, retrying fetch over a URL table. */
  def fetchRateLimited(urls: DataFrame, fetch: Fetch,
                       minIntervalMs: Long = 1000, maxRetries: Int = 5,
                       backoffMs: Long = 10): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val urlCol = urls.columns.head
    urls.select(col(urlCol).cast("string")).as[String]
      .mapPartitions { it =>
        // nanoTime has an arbitrary (possibly negative) origin — seed so
        // the FIRST fetch never waits, instead of comparing against 0
        // (which could sleep ~forever on a negative-origin clock)
        var lastMs = System.nanoTime() / 1000000L - minIntervalMs
        it.map { url =>
          var attempts = 0
          var res: Either[Int, String] = Left(-1)
          var done = false
          while (!done) {
            val now = System.nanoTime() / 1000000L
            val wait = lastMs + minIntervalMs - now
            if (wait > 0) Thread.sleep(wait)
            lastMs = System.nanoTime() / 1000000L
            attempts += 1
            res = fetch(url)
            done = res.isRight || attempts > maxRetries ||
              !RetryableStatus.contains(res.left.getOrElse(-1))
            if (!done) Thread.sleep(backoffMs << math.min(attempts - 1, 16))
          }
          FetchResult(url, res.toOption, res.left.getOrElse(200), attempts)
        }
      }.toDF()
  }

  /** S6: raw snapshot sink — payloads under `key=.../ ` partition dirs so
    * a re-scrape of one key touches one directory (and a key filter on
    * read is partition pruning). */
  def writeSnapshots(df: DataFrame, keyCol: String, payloadCol: String,
                     path: String): Unit =
    df.select(col(payloadCol).cast("string").as("payload"), col(keyCol).as("key"))
      .write.mode("overwrite").partitionBy("key").text(path)

  /** S8: resumable paged crawl. Walks (group, seq) cursors: seq advances
    * until `maxConsecutiveMiss` misses end the group (the reference's
    * 2×404 rule). Each group's pages are SPOOLED to parquet under
    * `stateDir/pages/group=<g>` BEFORE its cursor is committed to the
    * atomic checkpoint (payload-then-cursor, like the reference — a crash
    * between the two re-fetches at most one group, never loses one), and
    * the returned frame reads the whole spool, so a resumed run yields
    * the complete crawl, not just the remainder. */
  def crawlPaged(spark: SparkSession, groups: Seq[Int],
                 fetch: (Int, Int) => Option[String], stateDir: String,
                 maxConsecutiveMiss: Int = 2): DataFrame = {
    import spark.implicits._
    // cursor checkpoint through Hadoop FS, like the page spool — with an
    // hdfs:// or s3a:// stateDir a java.io.File checkpoint would always
    // read as absent and every "resumed" run would re-fetch all groups
    val ckPath = new org.apache.hadoop.fs.Path(s"$stateDir/cursor.ck")
    val fs = ckPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done: Set[Int] =
      if (fs.exists(ckPath)) {
        val in = fs.open(ckPath)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        body.split(",").filter(_.nonEmpty).map(_.toInt).toSet
      } else Set.empty
    var committed = done
    groups.filterNot(done).foreach { g =>
      val rows = Seq.newBuilder[(Int, String)]
      var seq = 1
      var miss = 0
      while (miss < maxConsecutiveMiss) {
        fetch(g, seq) match {
          case Some(body) => rows += ((seq, body)); miss = 0
          case None => miss += 1
        }
        seq += 1
      }
      // payload first…
      rows.result().toDF("seq", "body").coalesce(1)
        .write.mode("overwrite").parquet(s"$stateDir/pages/group=$g")
      // …then the cursor commit: tmp + FileContext.rename(OVERWRITE) —
      // atomic replace on HDFS/local with no delete-then-rename window
      // (a crash between those two calls would lose the whole
      // checkpoint), and it THROWS on failure instead of returning a
      // silently-discarded false like FileSystem.rename
      committed = committed + g
      val tmpPath = new org.apache.hadoop.fs.Path(s"$stateDir/cursor.ck.tmp")
      val out = fs.create(tmpPath, true)
      try out.write(committed.toSeq.sorted.mkString(",").getBytes("UTF-8"))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        ckPath.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmpPath, ckPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    spark.read.option("basePath", s"$stateDir/pages")
      .parquet(s"$stateDir/pages")
      .select(col("group").cast("int").as("group"), col("seq"), col("body"))
  }
}
