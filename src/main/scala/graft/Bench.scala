package graft
import org.apache.spark.sql.SparkSession

object Bench {
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ").take(300)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-sink write: forces full evaluation of every column (a bare
      // count() would let Catalyst prune the projections being measured).
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] FAIL $name: $e")
          Some(e.toString)
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(e)) => s"\"$k\":\"${esc(e)}\"" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._3.isDefined)
    // a failed query's partial elapsed time must not inflate the headline
    val total = results.collect { case (_, v, None) => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""n_failed":$nFailed,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // bare-JSON artifact: stdout rides through sbt's "[info] " decoration,
    // which breaks naive line parsers — the file carries the clean line
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
