package graft

import graft.operators.HadithSearch

/** The reference's full benchmark corpus (data/riyadussalihin/
  * TEST_QUERIES.md) run through the router and, for a category sample +
  * every edge case, through the full search lifecycle. The measured
  * success criteria (TEST_QUERIES.md:390-413) are computed by
  * [[Golden]] — the SAME implementation the bench's per-round
  * scoreboard artifact emits — and asserted per-case here, so the
  * driver-visible rates and the pinned bars can never desynchronize. */
class GoldenQueriesSpec extends SparkSpec {

  private lazy val queries: Seq[(String, String)] = Golden.queries()
  // warm-path dogfood: index built ONCE, every query via searchWith —
  // the serving shape, and it keeps this suite from rebuilding postings
  // + embedding slots per query
  private lazy val index = Golden.buildIndex(spark)
  private lazy val corpusRows = Golden.corpusRows(index)

  private def assertAll(os: Seq[Golden.Outcome], what: String): Unit = {
    assert(os.nonEmpty, s"no $what query was answerable — oracle broken?")
    os.foreach(o => assert(o.ok, s"'${o.query}' failed $what: ${o.detail}"))
  }

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

  test("narrator accuracy: top hit's narrator matches for every answerable narrator query (TEST_QUERIES bar: 100%)") {
    assertAll(Golden.narratorTop1(index, corpusRows, queries), "narrator top-1")
  }

  test("phrase found rate: top hit carries the phrase bonus for every answerable phrase query (TEST_QUERIES bar: 100%)") {
    assertAll(Golden.phraseFound(index, corpusRows, queries), "phrase-found")
  }

  test("exact-reference precision: spec mode returns exactly the cited hadith (TEST_QUERIES bar: 100%)") {
    assertAll(Golden.exactRefPrecision(index, corpusRows, queries), "exact-ref")
  }

  test("router classification accuracy on labeled categories (TEST_QUERIES bar: >95%)") {
    // ground truth from the documented category semantics: category 1 is
    // the exact-reference set; 5.1/5.2 are quoted exact phrases (the
    // router must at minimum EXTRACT the phrase for the bonus to fire)
    val cat1 = Golden.cat1Classification(queries)
    info(s"category-1 → exact_reference: ${cat1.count(_.ok)}/${cat1.size}")
    assert(cat1.nonEmpty && cat1.count(_.ok).toDouble / cat1.size > 0.95)
    val ph = Golden.phraseExtraction(queries)
    info(s"5.1/5.2 → phrase extracted: ${ph.count(_.ok)}/${ph.size}")
    assert(ph.nonEmpty && ph.count(_.ok).toDouble / ph.size > 0.95)
  }

  test("average term coverage on English-query categories (measured vs TEST_QUERIES' 70% target)") {
    // The reference's synonym-group coverage path (scoring.py:60-67) is
    // never fed by its shipped pipeline, so with raw-token semantics this
    // corpus measured 0.690 — under the >70% TARGET the (never-built)
    // benchmark runner documents. r14 ships the missing expander:
    // Router.lightStems feeds Router.coverageGroups into the serving
    // default (phrase intents stay unexpanded to protect phrase-found
    // top-1), measured 0.719. Floor pinned AT the reference's target.
    //
    // 0.719 is the SHIPPED-SEMANTICS CEILING, not a thin margin (r15
    // per-query miss audit over all 37 sub-1.0 queries): every
    // remaining missed group is one of (a) a stopword the reference's
    // own tokenizer keeps as a required token (router.py:41-44 keeps
    // every len>1 token, no stopword list — "by","what","from",
    // "about","how","your"…: parity forbids dropping them from the
    // denominator), (b) a word semantically ABSENT from the best-
    // matching text ("islam","water","tongue","fatimah"; "quran" vs
    // the corpus' "Qur'an" orthography — substring semantics per
    // scoring.py:66 cannot bridge an apostrophe), or (c) the Arabic
    // query 2.3 needing cross-lingual synonymy. None is reachable by
    // morphology: an r15 probe adding an -ion(s) family rule
    // (narrations→narrat, intention→intent) measured EXACTLY 0.7188
    // again — the stems were absent from the texts too. Raising the
    // number further requires a true synonym/translation dictionary,
    // which the reference neither ships nor specifies.
    val (avg, n) = Golden.termCoverage(index, queries)
    info(f"avg best-of-top-5 term coverage = $avg%.3f over $n queries (target 0.70, raw-token semantics measured 0.69)")
    assert(avg > 0.70, f"term coverage regressed: $avg%.3f (floor 0.70 = TEST_QUERIES' own bar)")
  }

  test("cross-lingual queries return results (TEST_QUERIES bar: >85% success)") {
    val cl = Golden.crossLingual(index, queries)
    assert(cl.nonEmpty)
    info(s"cross-lingual non-empty positive-score results: ${cl.count(_.ok)}/${cl.size}")
    assert(cl.count(_.ok).toDouble / cl.size > 0.85)
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

  test("scoreboard JSON carries every category with its bar (the bench-tail artifact shape)") {
    // the suite's warm index — the self-building overload would rebuild
    // it and re-run every category sweep just executed (r14 review)
    val json = Golden.scoreboard(index)._1
    Seq("router_cat1", "phrase_extract", "narrator_top1", "phrase_found",
      "exact_ref", "cross_lingual", "term_coverage", "n_queries")
      .foreach(k => assert(json.contains("\"" + k + "\""), s"scoreboard key $k missing"))
    info(json)
  }
}
