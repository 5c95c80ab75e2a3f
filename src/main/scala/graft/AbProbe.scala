package graft

import org.apache.spark.sql.SparkSession

/** Same-host A/B probe (scratch, not part of the library surface):
  * times a SUBSET of registered queries with the bench's own cold
  * mechanics (cache sweep + noop sink + min over interleaved passes),
  * so two source trees can be compared on identical measurement code.
  * Usage: runMain graft.AbProbe <sfDir> <q1,q2,...> <passes> [threads] [shufflePartitions]
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).getOrElse("minhash_lsh_pairs").split(",").toSeq
    val passes = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val threads = args.lift(3).flatMap(_.toIntOption).getOrElse(4)
    val shuffle = args.lift(4).flatMap(_.toIntOption).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = names.map(n => n -> SparkEntry.queries(n))
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to passes; (name, fn) <- qs) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(false))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      samples(name) = s :: samples.getOrElse(name, Nil)
      System.out.println(f"[ab] pass $pass $name%-20s $s%.2f s")
    }
    samples.toSeq.sortBy(_._1).foreach { case (n, ss) =>
      System.out.println(
        f"[ab] MIN $n%-20s ${ss.min}%.2f s  passes=${ss.reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
