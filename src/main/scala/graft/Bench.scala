package graft
import graft.operators.{Bm25, Postings}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-part benchmark: (1) the cold query suite — every SparkEntry query
  * end-to-end including its index builds (what a batch pipeline pays);
  * (2) the WARM serving path — engines opened once via Graft, then
  * repeated queries against resident indexes (what the reference's
  * 150 ms p95 serving target measures). One JSON line carries both.
  * [[BenchServe]] runs part 2 standalone.
  */
object Bench {
  private[graft] def esc(s: String): String =
    // truncate BEFORE escaping (truncating after can cut an escape pair
    // and break the JSON line), then strip every control char
    s.take(300).replace("\\", "\\\\").replace("\"", "\\\"")
      .map(c => if (c.isControl) ' ' else c)

  private def pct(sorted: Array[Double], p: Double): Double =
    sorted(math.min(sorted.length - 1, math.ceil(p * sorted.length).toInt - 1).max(0))

  // Locale.ROOT: the f interpolator uses the default locale, and a
  // decimal-comma locale (de_DE, tr_TR, …) would render invalid JSON
  private def fmt(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  /** The warm serving measurement: open engines + resident indexes once,
    * run each query `runs` times after warm-up, report p50/p95/mean.
    * Returns the serve section as a JSON object string. */
  private[graft] def serveSection(spark: SparkSession, sfDir: String, runs: Int): String =
    try {
      // drop any accumulated cache entries so the serve measurement
      // starts from a clean block manager (cold paths mark per-query
      // frames cached and never revisit them)
      spark.catalog.clearCache()
      // settle the heap: the cold suite leaves GBs of garbage + pending
      // ContextCleaner references; without a collection here the first
      // full GC lands INSIDE a timed loop (with 15 runs, p95 is the max,
      // so one pause was writing the whole tail — r6 p95 3.3× p50)
      System.gc()
      // narrow shuffles BEFORE the builds: the cached index layers
      // inherit this width, so per-query probe stages schedule `width`
      // tasks, not 32 (AQE stays ON through the opens/builds — they are
      // batch work). Default 8 balances open time (builds parallelize
      // 8-wide) against per-query task count; with the two probe legs
      // running concurrently (Postings.await2) both fit 32 cores.
      val buildWidth = math.max(1, sys.env.get("SPARK_GRAFT_SERVE_BUILD_WIDTH")
        .flatMap(_.toIntOption).getOrElse(8))
      spark.conf.set("spark.sql.shuffle.partitions", buildWidth.toString)
      val tOpen0 = System.nanoTime()
      val hadith = Graft.openHadith(spark, Queries.HadithBooks)
      val hadithOpenS = (System.nanoTime() - tOpen0) / 1e9
      val tOpen1 = System.nanoTime()
      val quran = Graft.openQuran(spark, Queries.QuranDir, Some(Queries.NpzPath))
      val quranOpenS = (System.nanoTime() - tOpen1) / 1e9
      val qv = quran.emb.get.where(col("verse_key") === "1:1")
        .head().getSeq[Float](1).toArray
      // resident BM25 index over the sf documents table
      val p = Postings.build(Tables(spark, sfDir, "documents"), "doc_id", "text").cache()
      val dict = Postings.dictionary(p).cache()
      val stats = Postings.corpusStats(p).cache()
      p.count(); dict.count(); stats.count()
      // resident ANN bucket index over the sf embeddings table
      val embT = Tables(spark, sfDir, "embeddings")
      val annIdx = graft.operators.Similarity
        .annIndex(embT, "vec_id", "embedding", Queries.Dim, nBits = 4).cache()
      annIdx.count()
      val ev = embT.where(col("vec_id") === 0)
        .head().getSeq[Float](1).toArray
      // indexes are built — now the per-QUERY tune (AQE off: stage
      // re-planning is pure latency on small fixed serving plans)
      GraftSession.tuneForServing(spark)

      val serveQueries: Seq[(String, () => Unit)] = Seq(
        "hadith_search_warm" -> (() =>
          hadith.search("Hadith narrated by Abu Hurairah", 10).collect(): Unit),
        "hadith_thematic_warm" -> (() =>
          hadith.search("patience and gratitude in hardship", 10).collect(): Unit),
        "quran_fts_warm" -> (() =>
          quran.search(Queries.QuranQuery, 5, "fts").collect(): Unit),
        "quran_hybrid_warm" -> (() =>
          quran.search(Queries.QuranQuery, 5, "hybrid", Some(qv)).collect(): Unit),
        "quran_get_verse_warm" -> (() => quran.getVerse("2:255").collect(): Unit),
        "exact_ref_warm" -> (() => // 680 = first global number in the corpus
          hadith.search("Riyad as-Salihin 680", 10, "spec").collect(): Unit),
        // prepared statements: the query plan is built once (what a
        // serving system amortizes); every timed run still executes the
        // full probe jobs against the resident index
        "bm25_topk_warm" -> {
          val df = Bm25.topK(Bm25.score(p, dict, stats, Queries.Bm25Terms), 20)
          () => df.collect(): Unit
        },
        "ann_topk_warm" -> {
          val df = graft.operators.Similarity.annTopKWith(annIdx, typedLit(ev),
            Queries.Dim, nBits = 4, k = 20)
          () => df.collect(): Unit
        })

      // warm-up every query first (JIT + codegen + broadcast reuse), then
      // measure in ROUND-ROBIN rounds (run 1 of every query, run 2, …) —
      // not 15 consecutive runs per query: host contention bursts last
      // minutes, and a burst over one query's whole consecutive block
      // writes its entire distribution (r8: one serve section reported
      // p50 957 ms for a query that medians ~250 ms on the same box).
      // Interleaved, a burst inflates a few ROUNDS of every query and
      // the per-query p50 recovers; p95 still reports the honest tail.
      serveQueries.foreach { case (_, run) => run(); run() }
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
      for (_ <- 1 to runs) {
        System.gc() // park collector debt outside the timed runs
        serveQueries.foreach { case (name, run) =>
          val t0 = System.nanoTime(); run()
          times(name) = times.getOrElse(name, Nil) :+ (System.nanoTime() - t0) / 1e6
        }
      }
      val entries = serveQueries.map { case (name, _) =>
        val t = times(name).toArray.sorted
        s""""$name":{"p50_ms":${fmt(pct(t, 0.50), 1)},"p95_ms":${fmt(pct(t, 0.95), 1)},"mean_ms":${fmt(t.sum / t.length, 1)},"runs":$runs}"""
      }
      (entries :+
        s""""hadith_open_s":${fmt(hadithOpenS, 2)},"quran_open_s":${fmt(quranOpenS, 2)}""")
        .mkString("{", ",", "}")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] FAIL serve: $e")
        s"""{"error":"${esc(e.toString)}"}"""
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // wall-clock budget: the driver's bench window is finite and a killed
    // run that wrote nothing is a lost round (r7 AND r8 both ended with
    // no parsed artifact). When the budget is exceeded the remaining cold
    // passes are SKIPPED (min over the passes that did complete) and the
    // run jumps straight to the serve section.
    // Default 2100 s: r8's driver kill landed at ~2,695 s, and the serve
    // section needs ~3 min after the cold suite — 35 min of cold passes
    // keeps the whole run inside the observed window. Explicit "0"
    // disables the deadline.
    val startNs = System.nanoTime()
    val deadlineS: Option[Int] = sys.env.get("SPARK_GRAFT_DEADLINE_S") match {
      case Some(v) => v.toIntOption.filter(_ > 0)
      case None    => Some(2100)
    }
    def pastDeadline: Boolean =
      deadlineS.exists(d => (System.nanoTime() - startNs) / 1e9 > d)

    // ── part 1: cold suite ───────────────────────────────────────────
    // Each query runs `coldRuns` times (min reported): a shared-host CPU
    // burst landing inside a single-shot measurement writes the whole
    // number. The runs are INTERLEAVED as full passes over the suite
    // (pass 1 of every query, then pass 2, …), NOT back-to-back per
    // query: contention windows on this host last minutes, so
    // back-to-back runs of one query both land inside the same window
    // and the min learns nothing — across passes the window hits
    // DIFFERENT queries and the min recovers the honest number (r8:
    // a ~5-min burst wrote 10-90 s into one alphabetical stretch of
    // every per-query min). Every run is STILL cold — the cache/persist
    // sweep below runs before each one.
    // clamp: "0"/negative would leave `samples` empty and throw far from
    // the cause; non-numeric would throw before any artifact is written.
    val coldRuns = math.max(1,
      sys.env.get("SPARK_GRAFT_COLD_RUNS").flatMap(_.toIntOption).getOrElse(2))
    // per-query wall cap (seconds); generous vs the ~18 s worst honest
    // cold query at sf0.1 — it exists to catch wedged queries, not slow ones
    val queryCapS = math.max(30,
      sys.env.get("SPARK_GRAFT_QUERY_TIMEOUT_S").flatMap(_.toIntOption).getOrElse(300))
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, List[(Double, Option[String])]]
    var deadlineHit = false

    // partial artifact > no artifact: rebuild the full JSON line from
    // whatever has completed so far and REWRITE the file after every
    // single query run — a kill at any point leaves the freshest state
    // on disk (r8's bench ran 2,695 s, was killed, and wrote nothing
    // because the old code wrote only at exit).
    def artifactJson(serveJson: String): String = {
      val results = named.flatMap { case (name, _) =>
        samples.get(name).map { runsOut =>
          // min over SUCCESSFUL passes only: a fast-failing pass would
          // report an artificially small "cold" time, and one transient
          // failure must not flag a query red when another pass measured
          // it fine — the error is reported only when every pass failed.
          val ok = runsOut.collect { case (t, None) => t }
          if (ok.nonEmpty) (name, ok.min, None)
          else (name, runsOut.map(_._1).min, runsOut.flatMap(_._2).headOption)
        }
      }
      // ms precision keeps the one-line artifact short enough for tail
      // captures that truncate from the front (a full-precision double per
      // query tripled the line length and broke downstream parsers)
      val qs = results.map { case (k, v, _) => s""""$k":${fmt(v, 3)}""" }
        .mkString("{", ",", "}")
      val failed = results.collect { case (k, _, Some(e)) => s"\"$k\":\"${esc(e)}\"" }
        .mkString("{", ",", "}")
      val skipped = named.collect { case (n, _) if !samples.contains(n) => s""""$n"""" }
        .mkString("[", ",", "]")
      val nFailed = results.count(_._3.isDefined)
      // a failed query's partial elapsed time must not inflate the headline
      val total = results.collect { case (_, v, None) => v }.sum
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","cold_runs":$coldRuns,"queries":$qs,""" +
        s""""n_failed":$nFailed,"failed":$failed,"skipped":$skipped,""" +
        s""""deadline_hit":$deadlineHit,"serve":$serveJson,"sf":"$sfDir"}"""
    }
    def writeArtifact(serveJson: String): String = {
      val json = artifactJson(serveJson)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        json.getBytes("UTF-8"))
      json
    }

    for (pass <- 1 to coldRuns; (name, fn) <- named) {
      // the two staged near-dup queries run ONCE (pass 1): a re-run hits
      // the stage memo (reporting a memo probe as "cold"), and
      // invalidating it instead would bill near_dup_survivors for a full
      // pipeline rebuild it is designed to never pay
      val once = name == "near_dup_groups" || name == "near_dup_survivors"
      if (pastDeadline) deadlineHit = true
      if (!deadlineHit && (!once || pass == 1)) {
        // each run measured against a clean block manager: several
        // operators cache intra-query frames, and the suite's accumulated
        // (never-revisited) entries otherwise squeeze execution memory for
        // the later queries — eviction thrash, not honest cold cost.
        // clearCache only drops CacheManager entries; the dedup operators'
        // localCheckpoint snapshots are RDD-level persists freed lazily by
        // the ContextCleaner, so drop those explicitly too — EXCEPT the
        // stage memo's snapshots: those are the one cross-query residency
        // that IS re-read (near_dup_survivors derives from the pairs that
        // near_dup_groups staged; on a cluster they'd be persisted tables).
        spark.catalog.clearCache()
        val staged = graft.operators.Dedup.stagedSnapshotIds
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!staged.contains(id)) rdd.unpersist(false)
        }
        val t0 = System.nanoTime()
        // Per-query cap: the deadline only fires BETWEEN queries, so one
        // wedged query would otherwise eat the whole window (r8 died
        // mid-query). The job group is thread-local — set it inside the
        // query's own thread so cancelJobGroup can reach its Spark jobs.
        val group = s"bench-$name-$pass"
        // noop-sink write: forces full evaluation of every column (a bare
        // count() would let Catalyst prune the projections being measured).
        val fut = scala.concurrent.Future {
          spark.sparkContext.setJobGroup(group, group, interruptOnCancel = true)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }(scala.concurrent.ExecutionContext.global)
        val err =
          try {
            scala.concurrent.Await.result(fut,
              scala.concurrent.duration.Duration(queryCapS.toLong, "s"))
            None
          } catch {
            case _: java.util.concurrent.TimeoutException =>
              spark.sparkContext.cancelJobGroup(group)
              System.err.println(s"[bench] TIMEOUT $name after ${queryCapS}s")
              Some(s"timeout after ${queryCapS}s")
            case e: Throwable =>
              System.err.println(s"[bench] FAIL $name: $e")
              Some(e.toString)
          }
        samples(name) = samples.getOrElse(name, Nil) :+
          (((System.nanoTime() - t0) / 1e9, err))
        writeArtifact("\"pending\"")
      }
    }
    if (deadlineHit)
      System.err.println(s"[bench] deadline ${deadlineS.getOrElse(0)}s exceeded — " +
        s"skipping remaining cold passes (${named.count(n => !samples.contains(n._1))} queries unmeasured)")

    // ── part 2: warm serving path ────────────────────────────────────
    val runs = sys.env.getOrElse("SPARK_GRAFT_SERVE_RUNS", "15").toInt
    val serveJson = serveSection(spark, sfDir, runs)

    // bare-JSON artifact: stdout rides through sbt's "[info] " decoration,
    // which breaks naive line parsers — the file carries the clean line
    val json = writeArtifact(serveJson)
    println(json)
    spark.stop()
  }
}

/** Standalone warm-path benchmark: skips the cold suite and measures
  * only the serving path (engine opens + repeated queries over resident
  * indexes). Same JSON shape as Bench's "serve" section. */
object BenchServe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SERVE_RUNS", "15").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val json = s"""{"metric":"serve","serve":${Bench.serveSection(spark, sfDir, runs)},"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SERVE.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
