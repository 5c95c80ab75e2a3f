package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the WARM serving path — not part of the
  * library surface. Opens the engines exactly like Bench.serveSection,
  * then reports per-query Spark job/stage/task counts and wall time so
  * serving latency can be attributed (scheduling overhead vs real work).
  */
object ServeProbe {
  private final class Counter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = new Counter
    spark.sparkContext.addSparkListener(c)

    val t0 = System.nanoTime()
    val hadith = Graft.openHadith(spark, Queries.HadithBooks)
    println(f"open hadith: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val quran = Graft.openQuran(spark, Queries.QuranDir, Some(Queries.NpzPath))
    println(f"open quran: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    val qv = quran.emb.get.where(col("verse_key") === "1:1")
      .head().getSeq[Float](1).toArray
    GraftSession.tuneForServing(spark)

    val queries: Seq[(String, () => Unit)] = Seq(
      "hadith_search" -> (() => hadith.search("Hadith narrated by Abu Hurairah", 10).collect(): Unit),
      "hadith_thematic" -> (() => hadith.search("patience and gratitude in hardship", 10).collect(): Unit),
      "quran_fts" -> (() => quran.search(Queries.QuranQuery, 5, "fts").collect(): Unit),
      "quran_hybrid" -> (() => quran.search(Queries.QuranQuery, 5, "hybrid", Some(qv)).collect(): Unit),
      "quran_get_verse" -> (() => quran.getVerse("2:255").collect(): Unit))

    // warm up twice, then measure 5 runs with listener counts
    queries.foreach { case (_, run) => run(); run() }
    for ((name, run) <- queries) {
      val times = (1 to 5).map { _ =>
        c.reset()
        val s = System.nanoTime(); run(); (System.nanoTime() - s) / 1e6
      }
      println(f"$name%-18s med=${times.sorted.apply(2)}%7.1f ms  jobs=${c.jobs.get}%2d stages=${c.stages.get}%2d tasks=${c.tasks.get}%3d  runs=${times.map(t => f"$t%.0f").mkString(",")}")
    }

    // split plan-building (Dataset construction + analysis) from
    // optimization+physical planning from execution, for the two slowest
    def split(name: String, build: () => org.apache.spark.sql.DataFrame): Unit = {
      val r = (1 to 3).map { _ =>
        val s0 = System.nanoTime()
        val df = build()
        val s1 = System.nanoTime()
        df.queryExecution.executedPlan // forces optimize + planning
        val s2 = System.nanoTime()
        df.collect()
        val s3 = System.nanoTime()
        ((s1 - s0) / 1e6, (s2 - s1) / 1e6, (s3 - s2) / 1e6)
      }
      val m = r.sortBy(t => t._1 + t._2 + t._3).apply(1)
      println(f"$name%-18s build=${m._1}%6.1f ms  plan=${m._2}%6.1f ms  exec=${m._3}%6.1f ms")
    }
    split("hadith_search", () => hadith.search("Hadith narrated by Abu Hurairah", 10))
    split("quran_hybrid", () => quran.search(Queries.QuranQuery, 5, "hybrid", Some(qv)))
    split("quran_get_verse", () => quran.getVerse("2:255"))
    spark.stop()
  }
}
