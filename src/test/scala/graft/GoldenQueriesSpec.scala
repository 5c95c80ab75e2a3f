package graft

import graft.operators.{HadithSearch, Ingest}
import scala.io.Source

/** The reference's full benchmark corpus (data/riyadussalihin/
  * TEST_QUERIES.md) run through the router and, for a category sample +
  * every edge case, through the full search lifecycle. Mirrors the
  * success criteria the reference documents (TEST_QUERIES.md:390-413):
  * graceful handling, narrator accuracy, phrase findability. */
class GoldenQueriesSpec extends SparkSpec {

  private val mdPath = "/root/reference/data/riyadussalihin/TEST_QUERIES.md"
  private lazy val queries: Seq[(String, String)] = {
    val src = Source.fromFile(mdPath, "UTF-8")
    try {
      val line = "^(\\d+(?:\\.\\d+){1,2})\\s{2,}(.+?)\\s*$".r
      src.getLines().collect { case line(id, q) => (id, q) }.toList
    } finally src.close()
  }
  // warm-path dogfood: index built ONCE, every query via searchWith —
  // the serving shape, and it keeps this suite from rebuilding postings
  // + embedding slots per query
  private lazy val index = HadithSearch.buildIndex(
    HadithSearch.silver(Ingest.validated(
      Ingest.readBooks(spark, "/root/reference/data/riyadussalihin/book_*.jsonl")))
  ).materialize()

  test("the benchmark corpus parses to the documented scale (≈86 queries + howtos)") {
    assert(queries.size >= 86, s"parsed only ${queries.size}")
  }

  test("every benchmark query routes without error and gets a valid class") {
    val classes = Set("exact_reference", "narrator", "thematic", "mixed")
    queries.foreach { case (id, q) =>
      val i = Router.route(q)
      assert(classes.contains(i.qtype), s"$id '$q' -> ${i.qtype}")
      assert(Router.buildFtsMatch(i) != null, s"$id match compile failed")
    }
  }

  test("narrator-category queries classify as narrator or exact_reference") {
    // category 2 heads that carry an explicit reporting pattern
    val narratorQs = queries.filter(_._1.startsWith("2.")).map(_._2)
      .filter(q => q.toLowerCase.contains("narrated by") || q.contains("عن "))
    assert(narratorQs.nonEmpty)
    narratorQs.foreach { q =>
      val t = Router.route(q).qtype
      assert(t == "narrator" || t == "exact_reference", s"'$q' -> $t")
    }
  }

  test("every edge case (category 8) searches gracefully end-to-end") {
    val edge = queries.filter(_._1.startsWith("8.")).map(_._2) :+ "" :+ "   "
    edge.foreach { q =>
      val hits = HadithSearch.searchWith(index, q, n = 3).collect()
      assert(hits.length <= 3, s"'$q' returned ${hits.length}")
      hits.foreach { h =>
        val s = h.getAs[Double]("score")
        assert(!s.isNaN && s >= 0.0 && s <= 1.0, s"'$q' produced score $s")
      }
    }
  }

  test("a sample from each category returns ranked in-range scores") {
    val sample = Seq("1.", "2.", "3.", "4.", "5.", "6.").flatMap(p =>
      queries.find(_._1.startsWith(p)).map(_._2))
    sample.foreach { q =>
      val hits = HadithSearch.searchWith(index, q, n = 5).collect()
      val scores = hits.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"'$q' not ranked")
      assert(scores.forall(s => s >= 0.0 && s <= 1.0), s"'$q' score range")
    }
  }
}
