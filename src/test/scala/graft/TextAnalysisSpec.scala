package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination sweep (TextAnalysis.contaminationPairs) — the column
  * operators themselves (quality/lang-id/token-counts/fingerprints) are
  * oracle-covered; this pins the pair semantics the split oracle can't
  * isolate: sub-n docs, the exact-threshold boundary, and distinctness
  * (a repeated shared shingle counts once). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("contamination pairs: threshold boundary, short docs, distinctness") {
    import spark.implicits._
    val corpus = Seq(
      // shares shingles "a_b_c" and "b_c_d" with bench 100 → n_shared=2
      (1L, "a b c d"),
      // shares only "a_b_c" → below minOverlap=2
      (2L, "x a b c y"),
      // repeated shingle must count ONCE: "a_b_c" twice, "b_c_d" once
      (3L, "a b c a b c d"),
      // shorter than n tokens → no shingles, never flagged
      (4L, "a b"),
      (5L, "nothing in common here at all")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e")).toDF("bench_id", "text")
    val got = TextAnalysis.contaminationPairs(
      corpus, "doc_id", "text", bench, "bench_id", "text",
      n = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 3's distinct shared set is {a_b_c, b_c_d, (c_a_b? no) ...}:
    // its distinct shingles are a_b_c, b_c_a, c_a_b, b_c_d — shared = 2
    assert(got === Set((1L, 100L, 2L), (3L, 100L, 2L)))
  }

  test("lm perplexity: hand-computed unigram model, repetitive doc scores lower ppl") {
    import spark.implicits._
    // corpus: "a a a b" and "c d" -> cf: a=3,b=1,c=1,d=1; T=6, V=4
    val docs = Seq((1L, "a a a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextAnalysis.lmPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // floor quantization + exp of the 6-dp-rounded avg: the operator's
    // cross-engine determinism contract (round-half's .5 boundary is
    // where engines disagree on identical doubles)
    def lp(cf: Long) = math.floor(math.log((cf + 1.0) / 10.0) * 1e6).toLong
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def neg6(sw: Long, dl: Long) = (0L - sw) / dl // positive: trunc == floor
    val ppl1 = r6(math.exp(neg6(3 * lp(3) + 1 * lp(1), 4) / 1e6))
    val ppl2 = r6(math.exp(neg6(lp(1) + lp(1), 2) / 1e6))
    assert(out(1L) === ((4L, ppl1)))
    assert(out(2L) === ((2L, ppl2)))
    // the doc dominated by the frequent token is less surprising
    assert(ppl1 < ppl2)
    assert(ppl1 >= 1.0)
  }

  test("repetition stats: dominant bigram fraction, sub-n docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),  // bigrams a_b,b_a,a_b,b_a → 4 grams, top 2, 0.5
      (2L, "c c c"),      // c_c,c_c → 2 grams, top 2, 1.0
      (3L, "x")           // no bigrams → no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(1L -> ((4L, 2L, 0.5)), 2L -> ((2L, 2L, 1.0))))
  }

  test("quality percentile cut: per-stratum rank, tie-break order, keeps the top") {
    import spark.implicits._
    // stratum "en": 11 docs with increasing stopword density (the score
    // driver); stratum "de": 2 docs (pr is 0 or 1 — only the max kept)
    val en = (1 to 11).map(i =>
      (i.toLong, ("the and of a " * i) + ("zz " * (12 - i)), "en"))
    val de = Seq((21L, "zz yy", "de"), (22L, "the and of the and", "de"))
    val docs = (en ++ de).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.qualityPercentile(docs, "doc_id", "text", "lang",
      minRank = 0.9).collect()
    val byLang = got.groupBy(_.getString(1))
    // en: percent_rank over 11 docs = k/10 — exactly the two top-scoring
    // docs reach pr >= 0.9; de: exactly the max (pr = 1.0)
    assert(byLang("en").map(_.getLong(0)).toSet === Set(10L, 11L))
    assert(byLang("de").map(_.getLong(0)).toSeq === Seq(22L))
    assert(got.forall(_.getDouble(3) >= 0.9))
    // kept docs carry the stratum-local TOP scores, not globals
    val all = TextAnalysis.qualityPercentile(docs, "doc_id", "text", "lang",
      minRank = 0.0).collect()
    val maxEn = all.filter(_.getString(1) == "en").map(_.getDouble(2)).max
    assert(byLang("en").map(_.getDouble(2)).max === maxEn)
  }

  test("approx percentile cut agrees with the exact form at full sketch accuracy") {
    import spark.implicits._
    val docs = (1 to 200).map(i =>
      (i.toLong, ("the and of a " * (i % 20 + 1)) + ("zz " * (20 - i % 20)),
        if (i % 3 == 0) "de" else "en")).toDF("doc_id", "text", "lang")
    val exact = TextAnalysis.qualityPercentile(docs, "doc_id", "text", "lang",
      minRank = 0.9).collect().map(_.getLong(0)).toSet
    val approx = TextAnalysis.qualityPercentileApprox(docs, "doc_id", "text", "lang",
      minRank = 0.9).collect().map(_.getLong(0)).toSet
    // at accuracy >> n the t-digest is exact on distinct values; the two
    // cuts may differ only at the threshold value itself (ties at q_min
    // are kept by the filter, rank-excluded by percent_rank) — so the
    // approx set must CONTAIN the exact set and any extras must sit
    // exactly at the threshold score
    assert(exact.subsetOf(approx))
    val byId = TextAnalysis.qualityPercentileApprox(docs, "doc_id", "text", "lang",
      minRank = 0.9).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val extras = approx -- exact
    val minKeptByLang = TextAnalysis.qualityPercentileApprox(docs, "doc_id", "text",
      "lang", minRank = 0.9).collect()
      .groupBy(_.getString(1)).map { case (l, rs) => l -> rs.map(_.getDouble(2)).min }
    extras.foreach { id =>
      assert(minKeptByLang.values.exists(_ === byId(id)),
        s"approx extra $id not at a threshold score") }
  }

  test("quality filter: threshold boundaries, gates, fixed reason order") {
    import spark.implicits._
    import graft.operators.TextAnalysis.QualityThresholds
    val th = QualityThresholds(minTokens = 3, maxTokens = 5,
      minMeanTokLen = 2.0, maxMeanTokLen = 6.0,
      minStopRatio = 0.2, minTtr = 0.5)
    val docs = Seq(
      // 3 tokens == minTokens → NOT too_short; 'the' gives stop 1/3 ≥ 0.2
      (1L, "the cat sat"),
      // 2 tokens → too_short; also below-ttr/stopword rules still fire on
      // non-empty docs (ttr 0.5 == min → kept on that rule)
      (2L, "xx xx"),
      // 6 tokens > maxTokens=5 → too_long only ('the'+'to' = 2/6 ≥ 0.2)
      (3L, "the dog ran to big hill"),
      // mean token length 1.0 < 2.0 → odd_token_len ONLY: 'a' is a
      // stopword, 1/5 = 0.2 == floor → not below it; ttr 1.0 ok
      (4L, "a b c d e"),
      // empty text → too_short ONLY (stats rules gated on n_tok > 0)
      (5L, ""),
      // Arabic-dominant: stopword floor must NOT fire; 4 distinct tokens,
      // ttr 1.0, mean len fine → kept
      (6L, "كتاب الصلاة عن النبي"),
      // repetitive: 4 tokens 1 distinct → ttr 0.25 < 0.5; stop 0 &
      // latin → low_stopword too; order fixed: low_stopword,repetitive
      (7L, "spam spam spam spam")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityFilter(docs, "doc_id", "text", th)
      .select("doc_id", "kept", "reasons")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(got(1L) === (true, ""))
    assert(got(2L) === (false, "too_short,low_stopword"))
    assert(got(3L) === (false, "too_long"))
    assert(got(4L) === (false, "odd_token_len"))
    assert(got(5L) === (false, "too_short"))
    assert(got(6L) === (true, ""))
    assert(got(7L) === (false, "low_stopword,repetitive"))
  }

  test("boilerplate ngrams: document frequency of distinct 3-grams, minDf cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "all rights reserved click here now"),    // a_r_r + r_r_c + ...
      (2L, "all rights reserved something else entirely"),
      (3L, "all rights reserved all rights reserved"), // repeated in-doc: counts ONCE
      (4L, "no shared phrases in this document"),
      (5L, "ab cd")).toDF("doc_id", "text")           // < n tokens: no grams
    val got = TextAnalysis.boilerplateNgrams(docs, "doc_id", "text", n = 3, minDf = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "all_rights_reserved" appears in docs 1,2,3 → df=3 (doc 3's repeat
    // adds nothing — DOCUMENT frequency, not term frequency)
    assert(got === Map("all_rights_reserved" -> 3L))
    // lower threshold surfaces the df=2 tail
    val df2 = TextAnalysis.boilerplateNgrams(docs, "doc_id", "text", n = 3, minDf = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df2("all_rights_reserved") === 3L)
    assert(df2.values.forall(_ >= 2L))
  }

  test("strip boilerplate: mined phrases vanish, clean docs keep every token") {
    import spark.implicits._
    val docs = Seq(
      // the mined phrase sits mid-stream: its 3 tokens go, neighbors stay
      (1L, "intro all rights reserved outro words"),
      (2L, "all rights reserved something else entirely"),
      // overlapping occurrences union (positions 1..4 all covered)
      (3L, "all rights reserved rights reserved all rights reserved"),
      // no boilerplate → token stream unchanged (the tokenized render)
      (4L, "no shared phrases in this document"),
      (5L, "ab cd")).toDF("doc_id", "text")
    val got = TextAnalysis.stripBoilerplate(docs, "doc_id", "text", n = 3, minDf = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // minDf=3 mines exactly "all_rights_reserved" (docs 1,2,3)
    assert(got(1L) === (("intro outro words", 6L, 3L)))
    assert(got(2L) === (("something else entirely", 6L, 3L)))
    // doc 3: starts {1, 6} cover 1-3 and 6-8; tokens 4-5 survive
    assert(got(3L) === (("rights reserved", 8L, 6L)))
    assert(got(4L) === (("no shared phrases in this document", 6L, 0L)))
    assert(got(5L) === (("ab cd", 2L, 0L)))
    // no phrase survives anywhere in the cleaned corpus
    assert(got.values.forall(!_._1.contains("all rights reserved")))
    // the broadcast-join scale path (forced via denseSetMax=0) is
    // row-identical to the narrow array-intersect path
    val joined = TextAnalysis.stripBoilerplate(docs, "doc_id", "text",
        n = 3, minDf = 3, denseSetMax = 0)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(joined === got)
  }

  test("strip cross dups: canonical copy survives, every other copy is removed") {
    import spark.implicits._
    val docs = Seq(
      // lowest doc_id holding the shared spans → the canonical copy
      (1L, "one two three four five"),
      // shares "one two three" + "two three four": covered 2..5, ends survive
      (2L, "zzz one two three four yyy"),
      // shares "one two three" only: positions 1..3 go
      (3L, "one two three extra stuff here"),
      // nothing shared → untouched
      (4L, "totally unique content words"),
      // sub-n doc: no shingles, untouched
      (5L, "ab"),
      // BOTH occurrences strip (canonical lives in doc 1, not "first
      // occurrence here" — within-doc policy is stripRepeats' job)
      (6L, "one two three one two three")).toDF("doc_id", "text")
    val got = TextAnalysis.stripCrossDups(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === (("one two three four five", 5L, 0L)))
    assert(got(2L) === (("zzz yyy", 6L, 4L)))
    assert(got(3L) === (("extra stuff here", 6L, 3L)))
    assert(got(4L) === (("totally unique content words", 4L, 0L)))
    assert(got(5L) === (("ab", 1L, 0L)))
    assert(got(6L) === (("", 6L, 6L)))
    // corpus-wide: the span survives in EXACTLY one document
    assert(got.values.count(_._1.contains("one two three")) === 1)
  }

  test("tfidf top terms: universal terms score zero, ranks are exact") {
    import spark.implicits._
    // 'the' appears in every doc (idf=ln(1)=0 → score 0);
    // 'alpha' is srcA-only, 'beta' srcB-only
    val docs = Seq(
      (1L, "the alpha alpha", "A"), (2L, "the alpha", "A"),
      (3L, "the beta", "B"), (4L, "the beta beta beta", "B")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", "source", k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    val idf6 = math.floor(math.log(4.0 / 2.0) * 1e6).toLong // df(alpha)=df(beta)=2
    assert(out(("A", 1)) === (("alpha", 3L, 3L * idf6)))
    assert(out(("B", 1)) === (("beta", 4L, 4L * idf6)))
    // rank 2 is the universal term at score 0 (cf·ln(1)·1e6 = 0)
    assert(out(("A", 2))._1 === "the" && out(("A", 2))._3 === 0L)
    assert(out(("B", 2))._3 === 0L)
  }

  test("pmi bigrams: perfect collocation beats independence; counts exact") {
    import spark.implicits._
    // 'new york' always adjacent; 'a'/'b' co-occur at chance
    val docs = Seq(
      (1L, "new york a b"), (2L, "new york b a"), (3L, "a new york b"),
      (4L, "b a new york"), (5L, "new york a b")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pmiBigrams(docs, "doc_id", "text", minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // only (new,york) reaches count 5 — every other adjacent pair varies
    assert(out.keySet === Set(("new", "york")))
    val (cAb, pmi6) = out(("new", "york"))
    assert(cAb === 5L)
    // local recompute of the exact same expression: m_tok=20, n_big=15,
    // c_new=c_york=5
    val expected = math.floor(math.log((5.0 * 20 * 20) / (5.0 * 5 * 15)) * 1e6).toLong
    assert(pmi6 === expected)
    assert(pmi6 > 0L, "a perfect collocation has positive PMI")
  }
}
