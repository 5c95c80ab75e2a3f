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

  // driver-side corpus projection for the quality-bar oracles below
  // (1,896 rows — the spec's own measurable criteria need ground truth)
  private lazy val corpusRows: Array[(String, String, String, String,
      Option[Long], Option[Long], Option[Long])] =
    index.docs.select("doc_id", "narrator", "english_text",
        "collection", "ref_global", "ref_book", "ref_num").collect().map { r =>
      def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getString(0), Option(r.getString(1)).getOrElse(""),
        Option(r.getString(2)).getOrElse(""), Option(r.getString(3)).getOrElse(""),
        optL(4), optL(5), optL(6))
    }

  private def narrMatches(probe: Seq[String], narrator: String): Boolean = {
    val nt = Router.tokenize(narrator)
    probe.forall(p => nt.exists(_.startsWith(p)))
  }

  test("narrator accuracy: top hit's narrator matches for every answerable narrator query (TEST_QUERIES bar: 100%)") {
    val narratorQs = queries.map(_._2)
      .map(q => q -> Router.route(q))
      .filter { case (_, i) => i.qtype == "narrator" && i.narrator.isDefined }
    assert(narratorQs.nonEmpty)
    val checked = narratorQs.flatMap { case (q, intent) =>
      val probe = (Router.tokenize(intent.narrator.get) match {
        case Nil => intent.tokens.take(6); case ts => ts.take(6)
      })
      // answerable ⇔ some corpus narrator matches every probe token
      // (prefix semantics — the same regime the narrator field probe uses)
      if (probe.nonEmpty && corpusRows.exists(r => narrMatches(probe, r._2))) {
        val top = HadithSearch.searchWith(index, q, n = 1).collect()
        assert(top.nonEmpty, s"'$q' returned no hits despite corpus coverage")
        val got = Option(top.head.getAs[String]("narrator")).getOrElse("")
        assert(narrMatches(probe, got),
          s"'$q' top hit narrator '$got' does not match probe $probe")
        Some(q)
      } else None
    }
    assert(checked.nonEmpty, "no narrator query was answerable — oracle broken?")
  }

  test("phrase found rate: top hit carries the phrase bonus for every answerable phrase query (TEST_QUERIES bar: 100%)") {
    val phraseQs = queries.filter(_._1.startsWith("5.1")).map(_._2)
      .flatMap(q => Router.route(q).phrase.map(q -> _))
    assert(phraseQs.nonEmpty)
    val checked = phraseQs.flatMap { case (q, phrase) =>
      // answerable ⇔ the phrase occurs verbatim (case-insensitive, the
      // same `instr` regime Scoring.phraseBonus applies) in some document
      val p = phrase.toLowerCase
      if (corpusRows.exists(_._3.toLowerCase.contains(p))) {
        val top = HadithSearch.searchWith(index, q, n = 1).collect()
        assert(top.nonEmpty, s"'$q' returned no hits despite corpus coverage")
        assert(top.head.getAs[Double]("phrase_bonus") > 0.0,
          s"'$q' top hit lacks the phrase bonus (phrase present in corpus)")
        Some(q)
      } else None
    }
    assert(checked.nonEmpty, "no phrase query was answerable — oracle broken?")
  }

  test("exact-reference precision: spec mode returns exactly the cited hadith (TEST_QUERIES bar: 100%)") {
    val refQs = queries.filter(_._1.startsWith("1.")).map(_._2)
      .flatMap(q => Router.parseExactRef(Router.route(q).normalized).map(q -> _))
    assert(refQs.nonEmpty)
    val checked = refQs.flatMap { case (q, ref) =>
      val expected = corpusRows.filter { case (_, _, _, coll, g, b, x) =>
        ref.collection.forall(_ == coll) && ref.global.forall(gg => g.contains(gg)) &&
        ref.book.forall(bb => b.contains(bb)) && ref.num.forall(xx => x.contains(xx))
      }.map(_._1).sorted.take(10)
      if (expected.nonEmpty) {
        val got = HadithSearch.searchWith(index, q, n = 10, mode = "spec")
          .collect().map(_.getAs[String]("doc_id")).toSeq
        assert(got === expected.toSeq, s"'$q' spec lookup mismatch")
        // a fully-specified global citation is unique in the corpus
        if (ref.global.isDefined)
          assert(got.size === 1, s"'$q' returned ${got.size} rows for a global citation")
        Some(q)
      } else None
    }
    assert(checked.nonEmpty, "no exact-ref query was answerable — oracle broken?")
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
