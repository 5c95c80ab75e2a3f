package graft

/** Pins the shuffle-telemetry listener ([[Bench.ShuffleTally]]) against
  * real executions: a keyed aggregate must register shuffle bytes, a
  * narrow job must register none — so the per-query `shuffle_*_mb`
  * fields in the bench artifact can be trusted as measurements, not
  * zeros from a silently-detached listener. */
class BenchTallySpec extends SparkSpec {

  test("ShuffleTally measures real shuffle bytes and stays silent on narrow jobs") {
    val tally = new Bench.ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    try {
      val pre = tally.settled()
      // a genuine exchange: groupBy forces a hash-partitioned shuffle
      spark.range(0L, 100000L, 1L, 4)
        .selectExpr("id % 97 as k", "id as v")
        .groupBy("k").count().collect()
      val post = tally.settled()
      assert(post._1 > pre._1, "no shuffle write bytes recorded")
      assert(post._2 > pre._2, "no shuffle read bytes recorded")
      // a narrow job adds nothing
      val pre2 = tally.settled()
      spark.range(1000).selectExpr("id * 2").collect()
      val post2 = tally.settled()
      assert(post2._1 == pre2._1 && post2._2 == pre2._2,
        "narrow job charged shuffle bytes")
    } finally spark.sparkContext.removeSparkListener(tally)
  }
}
