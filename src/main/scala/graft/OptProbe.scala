package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-query optimization probe (scratch, not part of the library
  * surface): runs ONE registered query with the bench's cold mechanics
  * and prints a per-stage cost breakdown — stage wall time, task count,
  * cumulative task time, shuffle bytes — so the expensive stages can be
  * named instead of guessed. Also dumps `.explain("formatted")` when
  * asked. Usage:
  *   runMain graft.OptProbe <sfDir> <query> [passes] [threads] [explainPath]
  */
object OptProbe {
  private final class StageTally extends SparkListener {
    case class St(name: String, var submitted: Long = 0L, var completed: Long = 0L,
                  var tasks: Int = 0, var taskMs: Long = 0L,
                  var shufR: Long = 0L, var shufW: Long = 0L, var input: Long = 0L)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, String)]
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobs(e.jobId) = (e.time, 0L,
        Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse(""))
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach { case (s, _, d) => jobs(e.jobId) = (s, e.time, d) }
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
      val s = stages.getOrElseUpdate(e.stageInfo.stageId, St(e.stageInfo.name))
      s.submitted = System.currentTimeMillis()
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val s = stages.getOrElseUpdate(e.stageInfo.stageId, St(e.stageInfo.name))
      s.completed = System.currentTimeMillis()
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val s = stages.getOrElseUpdate(e.stageId, St("?"))
      s.tasks += 1
      val m = e.taskMetrics
      if (m != null) {
        s.taskMs += m.executorRunTime
        s.shufR += m.shuffleReadMetrics.totalBytesRead
        s.shufW += m.shuffleWriteMetrics.bytesWritten
        s.input += m.inputMetrics.bytesRead
      }
    }
    def clear(): Unit = { stages.clear(); jobs.clear() }
    def report(): Unit = {
      // stages/jobs still running (or first seen at onTaskEnd) have
      // end=0 / submitted=0 — print them as "running"/"?" instead of
      // negative or epoch-scale walls that sort to the top and misname
      // the expensive stage (r18 ADVICE #4)
      def wallOf(s: St): Long =
        if (s.completed > 0 && s.submitted > 0) s.completed - s.submitted else -1L
      val byWall = stages.toSeq.sortBy { case (_, s) => -wallOf(s) }
      println(f"[opt] ${stages.size} stages, ${jobs.size} jobs")
      byWall.take(25).foreach { case (id, s) =>
        val w = wallOf(s)
        val ws = if (w >= 0) f"$w%5d ms" else "running "
        println(f"[opt]  stage $id%4d wall=$ws tasks=${s.tasks}%3d " +
          f"taskTime=${s.taskMs}%6d ms shufR=${s.shufR / 1024}%7d KB " +
          f"shufW=${s.shufW / 1024}%7d KB in=${s.input / 1024}%7d KB  ${s.name.take(90)}")
      }
      val jw = jobs.toSeq
        .map { case (id, (s, e, d)) => (id, if (e > 0) e - s else -1L, d) }
        .sortBy { case (_, w, _) => -w }
      jw.take(15).foreach { case (id, w, d) =>
        val ws = if (w >= 0) f"$w%5d ms" else "running "
        println(f"[opt]  job $id%4d wall=$ws  ${d.take(80)}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("quran_match_syntax")
    val passes = args.lift(2).flatMap(_.toIntOption).getOrElse(2)
    val threads = args.lift(3).flatMap(_.toIntOption).getOrElse(32)
    val explainPath = args.lift(4)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.codegen.cache.maxEntries",
        GraftSession.CodegenCacheEntries.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new StageTally
    spark.sparkContext.addSparkListener(tally)
    val fn = SparkEntry.queries(name)
    for (pass <- 1 to passes) {
      spark.catalog.clearCache()
      val staged = graft.operators.Dedup.stagedSnapshotIds
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!staged.contains(id)) rdd.unpersist(false)
      }
      Thread.sleep(200) // let listener events drain between passes
      tally.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val tAll = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[opt] pass $pass $name total=$tAll%.2f s (build=$tBuild%.2f s)")
      tally.report()
      if (pass == passes) explainPath.foreach { p =>
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(p), txt.getBytes("UTF-8"))
        println(s"[opt] explain written to $p")
      }
    }
    spark.stop()
  }
}
