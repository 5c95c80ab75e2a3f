package graft

import graft.sources.Scrape
import org.apache.spark.sql.functions._

/** S6/S7/S8 scraper ETL with deterministic fake transports. */
class ScrapeSpec extends SparkSpec {
  import spark.implicits._

  test("S7: per-partition rate limiter spaces fetches and records attempts") {
    val urls = Seq("u1", "u2", "u3", "u4").toDF("url").coalesce(1)
    val t0 = System.nanoTime()
    val out = Scrape.fetchRateLimited(urls, u => Right(s"body:$u"),
      minIntervalMs = 30, maxRetries = 3).collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out.length === 4)
    assert(out.forall(_.getAs[Int]("attempts") === 1))
    assert(out.forall(r => r.getAs[String]("body") === s"body:${r.getAs[String]("url")}"))
    // 4 fetches at ≥30ms spacing ⇒ ≥90ms wall-clock on one partition
    assert(elapsedMs >= 90, s"limiter did not space fetches ($elapsedMs ms)")
  }

  test("S7: retryable statuses back off and retry; terminal statuses do not") {
    val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val flaky: Scrape.Fetch = { u =>
      val n = calls.merge(u, 1, (a, b) => a + b)
      u match {
        case "flaky" => if (n < 3) Left(503) else Right("ok")
        case "gone" => Left(404)
        case _ => Right("ok")
      }
    }
    val out = Scrape.fetchRateLimited(Seq("flaky", "gone", "fine").toDF("url").coalesce(1),
      flaky, minIntervalMs = 1, maxRetries = 5, backoffMs = 1)
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[String]("body"), r.getAs[Int]("status"), r.getAs[Int]("attempts"))).toMap
    assert(out("flaky") === (("ok", 200, 3))) // two 503s, then success
    assert(out("gone") === ((null, 404, 1))) // 404 is terminal, no retry
    assert(out("fine") === (("ok", 200, 1)))
  }

  test("S6: snapshot sink partitions by key; key reads are pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val df = Seq(("b1", "<html>one</html>"), ("b2", "<html>two</html>"))
      .toDF("book", "html")
    Scrape.writeSnapshots(df, "book", "html", dir)
    val back = spark.read.text(s"$dir/key=b1").collect()
    assert(back.map(_.getString(0)).toSeq === Seq("<html>one</html>"))
    assert(spark.read.option("basePath", dir).text(s"$dir/key=*").count() === 2)
  }

  test("S8: paged crawl spools payloads before checkpointing; resume loses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl").toString
    // group -> number of pages present; group 3's fetch fails on first run
    val pages = Map(1 -> 3, 2 -> 1, 3 -> 2)
    def fetchOk(g: Int, a: Int): Option[String] =
      if (a <= pages.getOrElse(g, 0)) Some(s"$g:$a") else None
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val boom: (Int, Int) => Option[String] = {
      case (3, _) => throw new RuntimeException("transport down")
      case (g, a) => calls.incrementAndGet(); fetchOk(g, a)
    }
    intercept[RuntimeException] {
      Scrape.crawlPaged(spark, Seq(1, 2, 3), boom, s"$dir/crawl")
    }
    // groups 1 and 2 were spooled before the crash; the resumed run
    // skips their fetches but still returns the COMPLETE crawl
    val before = calls.get()
    val resumed = Scrape.crawlPaged(spark, Seq(1, 2, 3), { (g, a) =>
      if (g != 3) calls.incrementAndGet(); fetchOk(g, a)
    }, s"$dir/crawl").orderBy("group", "seq").collect()
    assert(calls.get() === before, "resume re-fetched committed groups")
    assert(resumed.map(_.getString(2)).toSeq ===
      Seq("1:1", "1:2", "1:3", "2:1", "3:1", "3:2"))
    // a fresh full crawl yields all pages, exactly the per-group counts
    val full = Scrape.crawlPaged(spark, Seq(1, 2, 3), fetchOk _, s"$dir/fresh")
    assert(full.groupBy("group").count().orderBy("group")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq === Seq(1 -> 3L, 2 -> 1L, 3 -> 2L))
  }
}
