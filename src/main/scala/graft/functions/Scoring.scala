package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hybrid scoring F9/F12/F14/A5/F16 as column expressions
  * (reference: mcp_server/apps/scoring.py:36-106, tools.py:59-82).
  */
object Scoring {

  /** F16: weight presets (reference: tools.py:59-72; proximity default
    * from scoring.py:24). */
  final case class Weights(
      wVector: Double = 0.6,
      wFts: Double = 0.4,
      bonusPhrase: Double = 0.05,
      bonusProximity: Double = 0.10,
      wCoverage: Double = 0.20)
  val Balanced: Weights = Weights()
  val TermPriority: Weights = Weights(0.30, 0.30, 0.20, 0.10, 0.60)

  /** F17: the design-spec's alternate weight set (reference:
    * data/riyadussalihin/HADITH_SEARCH_SPEC.md:325-392 — narrator +0.4,
    * phrase +0.3, coverage ×0.3, semantic ×0.25). The spec differs from
    * the shipped scoring.py weights; exposed as the "spec" preset per
    * SURVEY F17. */
  val SpecWeights: Weights = Weights(0.25, 0.25, 0.30, 0.10, 0.30)

  def preset(mode: String): Weights = mode match {
    case "term-priority" => TermPriority
    case "spec" => SpecWeights
    case _ => Balanced
  }

  def clamp01(c: Column): Column = least(lit(1.0), greatest(lit(0.0), c))

  /** Vector-similarity signal: clamp [0,1], null → 0 (scoring.py:54). */
  def vectorSignal(vs: Column): Column = clamp01(coalesce(vs, lit(0.0)))

  /** F9: bm25→signal, null → 0 (scoring.py:48-51).
    * Parity note (SURVEY F9): the reference computes 1/(1+max(0,bm25))
    * over SQLite's NEGATIVE bm25() scores, which collapses to 1.0 for
    * every FTS hit. Pass `parity = true` to reproduce that (matched ⇒
    * 1.0). The default maps our positive, higher-is-better BM25 through
    * the INCREASING saturation bm25/(1+bm25) ∈ [0,1), so lexical rank is
    * preserved (the reference's literal formula applied to positive
    * scores would invert it — best match, lowest signal). */
  def ftsSignal(bm25: Column, parity: Boolean = false): Column =
    if (parity) when(bm25.isNotNull, lit(1.0)).otherwise(lit(0.0))
    else {
      val b = greatest(lit(0.0), bm25)
      when(bm25.isNotNull, clamp01(b / (lit(1.0) + b))).otherwise(lit(0.0))
    }

  /** F12: phrase bonus when the lowercase phrase is a substring
    * (scoring.py:53-55). */
  def phraseBonus(text: Column, phrase: Column, bonus: Double): Column =
    when(phrase.isNotNull && instr(lower(text), lower(phrase)) > 0, lit(bonus))
      .otherwise(lit(0.0))

  /** A5: term-coverage ratio — fraction of (lowercase) query tokens that
    * appear as substrings of the text (scoring.py:62-70 token fallback). */
  def termCoverage(text: Column, tokens: Column): Column = {
    val lt = lower(text)
    when(size(tokens) > 0,
      size(filter(tokens, t => instr(lt, t) > 0)).cast("double") / size(tokens))
      .otherwise(lit(0.0))
  }

  /** A5 group form: term coverage over synonym groups — fraction of
    * groups with ANY member appearing as a substring of the lowercase
    * text (scoring.py:57-67, the branch no reference caller reaches; our
    * serving default feeds it [[graft.Router.synonymGroups]] to hit the
    * TEST_QUERIES.md 70% coverage target). `groups` is an
    * array<array<string>> literal column. */
  def termCoverageGroups(text: Column, groups: Column): Column = {
    val lt = lower(text)
    when(size(groups) > 0,
      size(filter(groups, g => exists(g, t => instr(lt, t) > 0))).cast("double") /
        size(groups))
      .otherwise(lit(0.0))
  }

  /** F14: weighted fusion with [0,1] clamp (scoring.py:95-106). */
  def total(v: Column, fts: Column, phraseB: Column, proxB: Column,
            coverage: Column, w: Weights): Column =
    clamp01(lit(w.wVector) * v + lit(w.wFts) * fts + phraseB + proxB +
      lit(w.wCoverage) * coverage)

  /** F15: Quran-path fusion — w_v·vector + w_fts·fts, rounded 6
    * (quran_mcp/search.py:254-256), with `greatest`-merged vector score
    * handled by the caller (J3). */
  def quranTotal(v: Column, fts: Column, wVector: Double, wFts: Double): Column =
    round(lit(wVector) * v + lit(wFts) * fts, 6)

  /** F17 full form: the design-spec's priority model
    * (HADITH_SEARCH_SPEC.md:325-392) — semantic·0.25 + narrator-match
    * +0.4 + arabic-term-fraction·0.3 + english-term-fraction·0.25 +
    * coverage·0.3 + grading (sahih +0.15 / hasan +0.10) + joined-phrase
    * +0.3. No [0,1] clamp (the spec has none). Terms are split ar/en on
    * the driver exactly as the spec's _is_arabic does. */
  final case class SpecParts(narratorBonus: Column, arabicBonus: Column,
                             englishBonus: Column, coverage: Column,
                             gradingBoost: Column, phraseBonus: Column) {
    def total(semantic: Column): Column =
      semantic * lit(0.25) + narratorBonus + arabicBonus + englishBonus +
        coverage * lit(0.3) + gradingBoost + phraseBonus
  }

  def specParts(narrator: Column, textEn: Column, textAr: Column,
                grading: Column, terms: Seq[String]): SpecParts = {
    def isAr(t: String) = t.exists(c => c >= '؀' && c <= 'ۿ')
    val (arTerms, enTerms) = terms.partition(isAr)
    val lnEn = lower(textEn)
    def hits(ts: Seq[String], text: Column): Column =
      ts.map(t => coalesce((instr(text, t) > 0).cast("int"), lit(0)))
        .reduceOption(_ + _).getOrElse(lit(0))
    // narrator match: ANY term (en first, as the spec concatenates) as a
    // lowercase substring of the narrator
    val narrHit = (enTerms ++ arTerms)
      .map(t => coalesce(instr(lower(narrator), t.toLowerCase) > 0, lit(false)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val arM = hits(arTerms, textAr) // spec: raw `in text_ar`, not lowered
    val enM = hits(enTerms.map(_.toLowerCase), lnEn)
    val g = lower(concat_ws(" ", grading))
    val phrase = terms.mkString(" ").toLowerCase
    SpecParts(
      narratorBonus = when(narrHit, lit(0.4)).otherwise(lit(0.0)),
      arabicBonus =
        if (arTerms.isEmpty) lit(0.0)
        else arM.cast("double") / lit(arTerms.size) * lit(0.3),
      englishBonus =
        if (enTerms.isEmpty) lit(0.0)
        else enM.cast("double") / lit(enTerms.size) * lit(0.25),
      coverage =
        if (terms.isEmpty) lit(0.0)
        else (arM + enM).cast("double") / lit(terms.size),
      gradingBoost = when(instr(g, "sahih") > 0, lit(0.15))
        .when(instr(g, "hasan") > 0, lit(0.10)).otherwise(lit(0.0)),
      phraseBonus =
        if (terms.size <= 1) lit(0.0)
        else when(coalesce(instr(lnEn, phrase) > 0 || instr(textAr, phrase) > 0,
          lit(false)), lit(0.3)).otherwise(lit(0.0)))
  }
}
