package graft.operators

import graft.Router
import graft.functions.{Scoring, VecFns}

import scala.collection.immutable.TreeMap

/** Typed DRIVER-RESIDENT hybrid search — the serving fast path that closes
  * the per-request Spark tax for bounded corpora.
  *
  * The DataFrame search ([[HadithSearch.searchWith]] / [[Quran.searchWith]])
  * is the scale path: its probe legs are distributed jobs and stay correct
  * at any corpus size. But every call pays Spark's per-execution overhead
  * (job scheduling + QueryExecution per leg — SURVEY §7.10's floor
  * decomposition), which puts a DataFrame-returning search at a couple of
  * hundred milliseconds per request no matter how small the corpus. The
  * reference serves from in-process SQLite/NumPy with no such tax
  * (mcp_server/tools.py:39-175, quran_mcp/search.py:178-318) and targets
  * <50 ms p95 search / <150 ms p95 end-to-end
  * (HADITH_SEARCH_SPEC.md:549, ROADMAP.md:41).
  *
  * This module is the typed twin: the SAME index layers the DataFrame path
  * serves from (postings, dictionaries, corpus stats, quantized embedding
  * slots, doc metadata) collected ONCE onto the driver — gated by counted
  * bounds, exactly like [[graft.Graft.MaxResidentRows]] — and the per-query
  * pipeline (route → BM25 probe → cosine probe → fusion → scoring → rank)
  * re-run per call in plain Scala. No result memoization: every call
  * executes its probes, like the reference's per-request SQLite/NumPy work.
  * Every arithmetic step mirrors the column expressions operation-for-
  * operation (same HALF_UP rounding grid, same evaluation order, same
  * null/NaN semantics), and ResidentSearchSpec pins typed == DataFrame
  * output across the reference's 86-query benchmark corpus. One caveat
  * is inherent: per-doc BM25 sums accumulate in query-term order here
  * and in Spark's aggregation order there — double addition is not
  * associative, so equality at the round-6 grid is empirical (held by
  * the parity suite and the same absorption the DuckDB oracle relies
  * on), not provable at exact rounding boundaries.
  *
  * Over-bound corpora never build layers here — callers fall back to
  * collecting the distributed search (one bounded job per call).
  */
object Resident {

  /** Hard bound on posting rows collected driver-side (~tens of MB of
    * primitive-array postings). Corpora above it serve through the
    * distributed search only. */
  val MaxResidentPostings: Long = 1L << 22

  // ---------------------------------------------------------------- hits

  /** Typed hadith search hit — the [[HadithSearch.searchWith]] output
    * envelope (tools.py:150-160) without the DataFrame. */
  final case class SearchHit(docId: String, bookId: String, narrator: String,
                             snippet: String, vectorSimilarity: Double,
                             ftsSignal: Double, phraseBonus: Double,
                             termCoverage: Double, score: Double)

  /** Typed tafsir search hit — the [[Quran.searchWith]] output envelope
    * (quran_mcp/search.py:289-307). */
  final case class QuranHit(verseKey: String, surah: Int, ayah: Int,
                            score: Double, vectorScore: Double,
                            ftsScore: Double, textPreview: String)

  // ------------------------------------------------- scalar-twin helpers

  private val Pow10 = Array(1.0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7)

  /** Spark `round(x, s)` twin: BigDecimal HALF_UP on the double's decimal
    * string form, NaN/Inf passed through (mathExpressions.Round).
    *
    * Fast path: when `x * 10^s` sits ≥1e-6 away from every rounding
    * boundary (an integer or a half-integer), the double-arithmetic
    * result is provably identical to the BigDecimal form — the scaled
    * product's error is ≤ ulp ≈ |y|·2.2e-16 < 1e-6 for |y| < 1e9, so
    * both agree on the floor and on the side of .5, and `(integer
    * double) / 10^s` is correctly rounded to the same nearest double
    * BigDecimal.toDouble returns. Near a boundary (or for huge inputs)
    * it falls back to BigDecimal. Turns the hot per-candidate rounding
    * from ~µs (BigDecimal) into ~ns. */
  def roundHalfUp(x: Double, scale: Int): Double = {
    if (x.isNaN || x.isInfinite) return x
    if (scale >= 0 && scale < Pow10.length) {
      val p = Pow10(scale)
      val y = x * p
      val a = math.abs(y)
      if (a < 1e9) {
        val f = math.floor(a)
        val frac = a - f
        val sign = if (y < 0) -1.0 else 1.0
        // + 0.0 normalizes the signed zero: a tiny negative rounding to
        // zero must return +0.0 like BigDecimal does, or the sign leaks
        // into Double.compare-based tie ordering downstream
        if (frac > 1e-6 && frac < 0.499999) return sign * f / p + 0.0
        if (frac > 0.500001 && frac < 0.999999) return sign * (f + 1) / p
      }
    }
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Spark `least(1, greatest(0, x))` twin. Spark's binary comparisons
    * order NaN ABOVE every number, so greatest(0, NaN) = NaN and
    * least(1, NaN) = 1.0 — a NaN signal clamps to 1.0, not NaN
    * (reachable only through a degenerate all-cancelling query vector;
    * mirrored so typed == DataFrame holds even there). */
  @inline private def clamp01(x: Double): Double =
    if (x.isNaN) 1.0 else math.min(1.0, math.max(0.0, x))

  /** Descending-double ordering with Spark's NaN-greatest semantics
    * (java.lang.Double.compare ranks NaN above +Inf): a desc sort puts
    * NaN FIRST, as Spark's `desc` does — Scala's default TotalOrdering
    * on a negated key would put it last. */
  private val DescNanFirst: Ordering[Double] =
    (a: Double, b: Double) => java.lang.Double.compare(b, a)

  /** (score desc NaN-first, id asc) — the candidate-cut order of every
    * probe leg's `orderBy(desc(score), asc(id)).limit(k)`. */
  private val byScoreDescIdAsc: Ordering[(Long, Double)] =
    (x: (Long, Double), y: (Long, Double)) => {
      val c = java.lang.Double.compare(y._2, x._2)
      if (c != 0) c else java.lang.Long.compare(x._1, y._1)
    }

  /** Spark `trim` twin (StringTrim trims U+0020 only — narrower than
    * java.lang.String#trim, which strips all controls ≤ 0x20). */
  private def trimSpaces(s: String): String = {
    if (s == null) return null
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  /** Spark `substring(s, 1, n)` twin — counts CODE POINTS, as
    * UTF8String.substringSQL does (String#substring counts UTF-16 units
    * and would split differently past the BMP). */
  private def substrCp(s: String, n: Int): String = {
    if (s == null) return null
    val it = s.codePoints().iterator()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n && it.hasNext) { sb.appendCodePoint(it.nextInt()); i += 1 }
    sb.toString
  }

  /** F9 fts signal twin ([[Scoring.ftsSignal]]) over the fused bm25. */
  private def ftsSignalLocal(bm: Option[Double], parity: Boolean): Double =
    bm match {
      case None => 0.0
      case Some(_) if parity => 1.0
      case Some(x) => val b = math.max(0.0, x); clamp01(b / (1.0 + b))
    }

  /** F17 spec-score twin ([[Scoring.specParts]]) — identical operation
    * order, so doubles are bit-equal to the column form. */
  private def specScoreLocal(narrator: String, lnEn: String, ar: String,
                             gradingWs: String, terms: Seq[String],
                             v: Double): Double = {
    def isAr(t: String) = t.exists(c => c >= '؀' && c <= 'ۿ')
    val (arTerms, enTerms) = terms.partition(isAr)
    def hits(ts: Seq[String], text: String): Int =
      ts.count(t => text != null && text.contains(t))
    val lnNarr = if (narrator == null) null else narrator.toLowerCase
    val narrHit = lnNarr != null &&
      (enTerms ++ arTerms).exists(t => lnNarr.contains(t.toLowerCase))
    val arM = hits(arTerms, ar) // spec: raw `in text_ar`, not lowered
    val enM = hits(enTerms.map(_.toLowerCase), lnEn)
    val g = if (gradingWs == null) "" else gradingWs.toLowerCase
    val phrase = terms.mkString(" ").toLowerCase
    val narratorBonus = if (narrHit) 0.4 else 0.0
    val arabicBonus =
      if (arTerms.isEmpty) 0.0 else arM.toDouble / arTerms.size * 0.3
    val englishBonus =
      if (enTerms.isEmpty) 0.0 else enM.toDouble / enTerms.size * 0.25
    val coverage =
      if (terms.isEmpty) 0.0 else (arM + enM).toDouble / terms.size
    val gradingBoost =
      if (g.contains("sahih")) 0.15 else if (g.contains("hasan")) 0.10 else 0.0
    val phraseBonus =
      if (terms.size <= 1) 0.0
      else if ((lnEn != null && lnEn.contains(phrase)) ||
               (ar != null && ar.contains(phrase))) 0.3 else 0.0
    v * 0.25 + narratorBonus + arabicBonus + englishBonus +
      coverage * 0.3 + gradingBoost + phraseBonus
  }

  /** BM25 per-(doc,term) weight twin ([[Bm25.score]] / scoreResident):
    * same expression shape — long-subtraction idf numerator, double
    * division order preserved. */
  @inline private def bm25Weight(tf: Long, dl: Int, df: Long,
                                 nDocs: Long, avgdl: Double): Double = {
    val idf = math.log(((nDocs - df) + 0.5) / (df + 0.5) + 1.0)
    idf * ((tf * (Bm25.K1 + 1)) /
      (tf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * dl / avgdl)))
  }

  // ------------------------------------------------------ hadith layers

  final case class Posting(doc: Long, tf: Long, dl: Int)
  final case class Slot(doc: Long, buckets: Array[Int], qs: Array[Double],
                        na: Double)
  /** `gradingWs` pre-joins the grading ARRAY the way the column form's
    * `concat_ws(" ", grading)` does (null array → "", null elements
    * skipped) — [[specScoreLocal]] then only lowercases it.
    * `englishLower` precomputes `english.toLowerCase` (the value the
    * column form's `lower(english_text)` yields): phrase-bonus and
    * coverage tests run per candidate per query, and lowercasing a
    * multi-KB document text dominated the scoring loop. */
  final case class DocMeta(docId: String, bookId: String, narrator: String,
                           gradingWs: String, english: String, arabic: String,
                           englishLower: String)

  /** The driver-resident hadith index: the same layers the DataFrame
    * probes join, collected once. Field → term → postings as primitive-
    * backed arrays; slots as bucket-sorted parallel arrays (the exact
    * rows of [[Hybrid.embedSlots]]); docs keyed by the numeric surrogate. */
  final class HadithLayers(
      val post: Map[String, Map[String, Array[Posting]]],
      val dicts: Map[String, TreeMap[String, Long]],
      val stats: Map[String, (Long, Long)],
      val slots: Array[Slot],
      val docs: Map[Long, DocMeta],
      val dim: Int)

  /** Collect the hadith index driver-side, or None when any counted bound
    * trips (doc rows, posting rows, per-field vocabulary) — the caller
    * then stays on the distributed search. Runs bounded Spark jobs ONCE;
    * per-query typed searches afterwards run zero jobs. */
  def hadithLayers(idx: HadithSearch.Index, maxDocs: Long,
                   maxPostings: Long = MaxResidentPostings): Option[HadithLayers] = {
    if (idx.docs.count() > maxDocs) return None
    if (idx.post.count() > maxPostings) return None
    val dicts = HadithSearch.Fields.map(f => f -> idx.dictLocal(f)).toMap
    if (dicts.values.exists(_.isEmpty)) return None
    val postRows = idx.post.select("field", "term", "doc_id", "tf", "dl").collect()
    val post: Map[String, Map[String, Array[Posting]]] = postRows
      .groupBy(_.getString(0))
      .map { case (f, rs) =>
        f -> rs.groupBy(_.getString(1)).map { case (t, ps) =>
          t -> ps.map(r => Posting(r.getLong(2), r.getLong(3), r.getInt(4)))
        }
      }
    val slots = idx.slots.select("doc_id", "buckets", "qs", "na").collect()
      .map(r => Slot(r.getLong(0),
        r.getSeq[Long](1).toArray.map(_.toInt),
        r.getSeq[Double](2).toArray, r.getDouble(3)))
    val docs = idx.docs.select("num_id", "doc_id", "book_id", "narrator",
        "grading", "english_text", "arabic_text").collect()
      .map { r =>
        val gradingWs =
          if (r.isNullAt(4)) ""
          else r.getSeq[String](4).filter(_ != null).mkString(" ")
        val en = r.getString(5)
        r.getLong(0) -> DocMeta(r.getString(1), r.getString(2),
          r.getString(3), gradingWs, en, r.getString(6),
          if (en == null) null else en.toLowerCase)
      }
      .toMap
    Some(new HadithLayers(post,
      dicts.map { case (f, d) => f -> d.get },
      HadithSearch.Fields.map(f => f -> idx.statLocal(f)).toMap,
      slots, docs, idx.dim))
  }

  /** Lexical leg twin of [[HadithSearch.fieldProbe]]: prefix expansion by
    * dictionary range scan, BM25 accumulation, (-bm25, doc) top-k. */
  private def lexProbe(L: HadithLayers, field: String, terms: Seq[String],
                       prefix: Boolean, k: Int): Seq[(Long, Double)] = {
    val dict = L.dicts(field)
    val ts = terms.distinct
    val expanded: Seq[(String, Long)] =
      if (prefix)
        ts.flatMap(t => dict.iteratorFrom(t).takeWhile(_._1.startsWith(t))).distinct
      else ts.flatMap(t => dict.get(t).map(t -> _))
    if (expanded.isEmpty) return Nil
    val (nDocs, sumDl) = L.stats(field)
    val avgdl = sumDl.toDouble / nDocs
    val fieldPost = L.post.getOrElse(field, Map.empty)
    val acc = new java.util.HashMap[java.lang.Long, java.lang.Double]()
    expanded.foreach { case (t, df) =>
      fieldPost.getOrElse(t, Array.empty[Posting]).foreach { p =>
        val w = bm25Weight(p.tf, p.dl, df, nDocs, avgdl)
        val prev = acc.get(p.doc)
        acc.put(p.doc, if (prev == null) w else prev + w)
      }
    }
    import scala.jdk.CollectionConverters._
    acc.asScala.toSeq
      .map { case (d, w) => (d.longValue, roundHalfUp(w, 6)) }
      .sorted(byScoreDescIdAsc)
      .take(k)
  }

  /** Semantic leg twin of [[Hybrid.vectorCandidatesFromSlots]]: the same
    * driver-quantized query, array-ordered sparse dot, round-6 cosine,
    * (-cos, doc) top-k. */
  private def vecProbe(L: HadithLayers, queryTokens: Seq[String],
                       k: Int): Seq[(Long, Double)] = {
    if (queryTokens.isEmpty) return Nil
    val qn = VecFns.l2NormalizeLocal(VecFns.hashEmbedLocal(queryTokens, L.dim))
    val qq = qn.map(x => BigDecimal(x * VecFns.Scale)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val qnorm = math.sqrt(qq.map(x => x * x).sum)
    if (qnorm == 0.0) return Nil // zero-norm query: empty leg (see Hybrid)
    val out = L.slots.map { s =>
      var dot = 0.0
      var i = 0
      while (i < s.qs.length) { dot += s.qs(i) * qq(s.buckets(i)); i += 1 }
      (s.doc, roundHalfUp(dot / (s.na * qnorm), 6))
    }
    out.toSeq.sorted(byScoreDescIdAsc).take(k)
  }

  /** Typed twin of [[HadithSearch.searchWith]] — route, field-scoped
    * lexical probe, semantic probe, fusion, scoring, rank, all on the
    * driver. Spec-mode exact citations are handled by the ENGINE
    * (lookupRefTyped) before this is called. */
  def searchHadith(L: HadithLayers, query: String, n: Int = 10,
                   mode: String = "balanced",
                   parityFts: Boolean = false): Seq[SearchHit] =
    searchHadithScored(L, query, n, mode, parityFts)._1

  /** [[searchHadith]] plus the fused candidate-pool size (the envelope's
    * `total_candidates` — the pool before the top-n cut). */
  def searchHadithScored(L: HadithLayers, query: String, n: Int = 10,
                         mode: String = "balanced",
                         parityFts: Boolean = false): (Seq[SearchHit], Int) = {
    val intent = Router.route(query)
    val w = Scoring.preset(mode)
    val k = math.max(50, n * 5)

    val lex: Seq[(Long, Double)] =
      if (intent.qtype == "narrator" && intent.narrator.isDefined) {
        val nt = Router.tokenize(intent.narrator.get) match {
          case Nil => intent.tokens.take(6); case ts => ts.take(6)
        }
        if (nt.isEmpty) Nil else lexProbe(L, "narrator", nt, prefix = true, k)
      } else {
        val terms = intent.phrase.map(Router.tokenize(_).toSeq).getOrElse(intent.tokens.take(6))
        val isArabic = terms.exists(_.exists(c => c >= '؀' && c <= 'ۿ'))
        if (terms.isEmpty) Nil
        else lexProbe(L, if (isArabic) "ar" else "en", terms,
          prefix = intent.phrase.isEmpty, k)
      }
    val vec = vecProbe(L, Router.embedTokens(intent.normalized), k)

    val bm = lex.toMap
    val co = vec.toMap
    val phraseLower = intent.phrase.map(_.toLowerCase)
    // synonym-group coverage twin (Scoring.termCoverageGroups): groups
    // expand once per query, never per candidate; phrase intents stay
    // unexpanded (Router.coverageGroups is the shared decision point)
    val covGroups = Router.coverageGroups(intent)
    val hits = (bm.keySet ++ co.keySet).toSeq.sorted.flatMap { id =>
      L.docs.get(id).map { d =>
        val v = clamp01(co.getOrElse(id, 0.0))
        val fts = ftsSignalLocal(bm.get(id), parityFts)
        // precomputed lower(english_text) (see DocMeta.englishLower)
        // feeds both the phrase bonus and coverage
        val lnEn = d.englishLower
        val pb =
          if (phraseLower.exists(p => lnEn != null && lnEn.contains(p))) w.bonusPhrase
          else 0.0
        val cov =
          if (covGroups.isEmpty) 0.0
          else covGroups.count(g => lnEn != null && g.exists(lnEn.contains))
            .toDouble / covGroups.size
        val score =
          if (mode == "spec")
            specScoreLocal(d.narrator, lnEn, d.arabic, d.gradingWs,
              intent.tokens, v)
          else clamp01(w.wVector * v + w.wFts * fts + pb + 0.0 + w.wCoverage * cov)
        SearchHit(d.docId, d.bookId, d.narrator,
          substrCp(trimSpaces(d.english), 240),
          roundHalfUp(v, 4), roundHalfUp(fts, 4), roundHalfUp(pb, 4),
          roundHalfUp(cov, 4), roundHalfUp(score, 4))
      }
    }
    (hits.sorted(new Ordering[SearchHit] {
      def compare(x: SearchHit, y: SearchHit): Int = {
        val c = java.lang.Double.compare(y.score, x.score) // desc, NaN first
        if (c != 0) c else x.docId.compareTo(y.docId)
      }
    }).take(n), (bm.keySet ++ co.keySet).size)
  }

  /** Typed fts_match hit (the MCP tool's row shape, mcp_stdio.py:156-191). */
  final case class FtsMatchHit(docId: String, narrator: String,
                               snippet: String, bm25: Double)

  /** Typed twin of the MCP fts_match probe: per-field exact-term BM25
    * legs AND-merged (a doc must match EVERY provided leg; leg scores
    * sum), ranked by (-raw bm25, doc_id), backfilled from the resident
    * doc metadata, score rounded 4 for display. */
  def ftsMatch(L: HadithLayers, legs: Seq[(String, String)],
               limit: Int): Seq[FtsMatchHit] = {
    if (legs.isEmpty) return Nil
    // legs are COMPLETE (no per-leg truncation): cutting each leg to a
    // fan-out before the AND-intersection drops documents that genuinely
    // match every field (a doc ranked #51 in one leg is still a true
    // AND-match). Bounded: the resident layers exist only for corpora
    // under the counted bounds.
    val top = mergeFtsLegs(legs.map { case (f, text) =>
      lexProbe(L, f, Router.tokenize(text).take(6), prefix = false,
        Int.MaxValue).toMap
    }, limit)
    top.flatMap { case (id, s) => L.docs.get(id).map(d => (d, s)) }
      .sortBy { case (d, s) => (-s, d.docId) }
      .map { case (d, s) => FtsMatchHit(d.docId, d.narrator,
        substrCp(trimSpaces(d.english), 240),
        math.round(s * 10000.0) / 10000.0) }
  }

  /** The fts_match AND-merge for COLLECTED legs: docs present in EVERY
    * leg, leg scores summed (leg order), ranked (-score, id), truncated
    * to `limit`. The engine's distributed fallback expresses the same
    * merge as a union + groupBy plan (it must not collect unbounded
    * legs); ResidentSearchSpec pins the two forms equal. */
  def mergeFtsLegs(legMaps: Seq[Map[Long, Double]],
                   limit: Int): Seq[(Long, Double)] = {
    if (legMaps.isEmpty) return Nil
    val matched = legMaps.reduce((a, b) =>
      a.keySet.intersect(b.keySet).map(k => k -> (a(k) + b(k))).toMap)
    matched.toSeq.sortBy { case (id, s) => (-s, id) }.take(limit)
  }

  // ------------------------------------------------------- quran layers

  final case class VerseMeta(surah: Int, ayah: Int, textPlain: String)

  /** The quantized tafsir embedding matrix as FLAT parallel primitive
    * arrays (row-major `flat`, one `dim`-wide stripe per verse): the
    * per-query dense dot then streams one contiguous 19 MB block with
    * no per-row array dereference or tuple boxing — measured ~3× the
    * tuple-per-row form on the 6,236 × 384 corpus. */
  final class QuranEmb(val vks: Array[String], val flat: Array[Double],
                       val nq: Array[Double], val dim: Int)

  /** The driver-resident tafsir index: postings/dictionary/stats plus the
    * quantized embedding matrix ([[Quran.indexFromLayers]]' embQ rows)
    * and the verse metadata the backfill joins. */
  final class QuranLayers(
      val post: Map[String, Array[Posting]],
      val dict: Map[String, Long],
      val stats: (Long, Long),
      val embQ: Option[QuranEmb],
      val docs: Map[String, Array[VerseMeta]])

  /** Collect the tafsir index driver-side, or None when a counted bound
    * trips. Same contract as [[hadithLayers]]. */
  def quranLayers(idx: Quran.Index, maxDocs: Long,
                  maxPostings: Long = MaxResidentPostings): Option[QuranLayers] = {
    if (idx.docs.count() > maxDocs) return None
    if (idx.postings.count() > maxPostings) return None
    if (idx.dictLocal.isEmpty) return None
    val post = idx.postings.select("term", "doc_id", "tf", "dl").collect()
      .groupBy(_.getString(0))
      .map { case (t, ps) =>
        t -> ps.map(r => Posting(r.getLong(1), r.getLong(2), r.getInt(3)))
      }
    val embQ = idx.embQ.map { e =>
      val rows = e.select("verse_key", "qv", "nq").collect()
      val dim = if (rows.isEmpty) 0 else rows(0).getSeq[Double](1).size
      val vks = new Array[String](rows.length)
      val nq = new Array[Double](rows.length)
      val flat = new Array[Double](rows.length * dim)
      var i = 0
      while (i < rows.length) {
        vks(i) = rows(i).getString(0)
        nq(i) = rows(i).getDouble(2)
        val qv = rows(i).getSeq[Double](1)
        var j = 0
        while (j < dim) { flat(i * dim + j) = qv(j); j += 1 }
        i += 1
      }
      new QuranEmb(vks, flat, nq, dim)
    }
    val docs = idx.docs.select("verse_key", "surah", "ayah", "text_plain").collect()
      .groupBy(_.getString(0))
      .map { case (vk, rs) =>
        vk -> rs.map(r => VerseMeta(r.getInt(1), r.getInt(2), r.getString(3)))
      }
    Some(new QuranLayers(post, idx.dictLocal.get, idx.statsLocal, embQ, docs))
  }

  /** Typed twin of [[Quran.searchWith]]: exact-term BM25 leg, cosine leg
    * with P6 drop + per-verse max-merge (J3), F15 weighted fusion,
    * backfill, order-preserving text-block dedupe (T4), top-n. */
  def searchQuran(L: QuranLayers, query: String,
                  queryVec: Option[Array[Float]], n: Int = 5,
                  mode: String = "hybrid"): Seq[QuranHit] = {
    val semanticOk = L.embQ.isDefined && queryVec.isDefined
    val (wv, wf) = Quran.resolveWeights(mode, semanticOk)
    val k = math.max(n * 5, 50)

    val ftsLeg: Seq[(Long, Double)] = {
      val raw = Router.embedTokens(query).distinct
      if (raw.isEmpty || wf == 0.0) Nil
      else {
        val terms = raw.flatMap(t => L.dict.get(t).map(t -> _))
        if (terms.isEmpty) Nil
        else {
          val (nDocs, sumDl) = L.stats
          val avgdl = sumDl.toDouble / nDocs
          val acc = new java.util.HashMap[java.lang.Long, java.lang.Double]()
          terms.foreach { case (t, df) =>
            L.post.getOrElse(t, Array.empty[Posting]).foreach { p =>
              val w = bm25Weight(p.tf, p.dl, df, nDocs, avgdl)
              val prev = acc.get(p.doc)
              acc.put(p.doc, if (prev == null) w else prev + w)
            }
          }
          import scala.jdk.CollectionConverters._
          acc.asScala.toSeq
            .map { case (d, w) => (d.longValue, roundHalfUp(w, 6)) }
            .sortBy { case (d, w) => (-w, d) }
            .take(math.max(n * 5, 25))
        }
      }
    }

    val vecLeg: Seq[(String, Double)] =
      if (!semanticOk || wv == 0.0) Nil
      else {
        val qq = VecFns.quantizeLocal(queryVec.get)
        val qnorm = math.sqrt(qq.map(x => x * x).sum)
        if (qnorm == 0.0) Nil // zero-norm query: empty leg (see Quran twin)
        else {
          val E = L.embQ.get
          val dim = E.dim
          // J3 max-merge riding the scan (verse keys are unique in the
          // bundled cache, but the DataFrame twin groupBy-maxes — keep
          // the same semantics for a cache that ever carried duplicates)
          val best = new java.util.HashMap[String, java.lang.Double]()
          var i = 0
          while (i < E.vks.length) {
            var dot = 0.0
            var j = i * dim
            val end = j + dim
            var qj = 0
            while (j < end) { dot += E.flat(j) * qq(qj); j += 1; qj += 1 }
            val cos = roundHalfUp(dot / (E.nq(i) * qnorm), 6)
            if (cos > 0) { // P6 (search.py:167-169); NaN unreachable (qnorm>0, nq>0)
              val prev = best.get(E.vks(i))
              if (prev == null || cos > prev.doubleValue) best.put(E.vks(i), cos)
            }
            i += 1
          }
          import scala.jdk.CollectionConverters._
          best.asScala.toSeq.map { case (vk, c) => (vk, c.doubleValue) }
            .sorted(new Ordering[(String, Double)] {
              def compare(x: (String, Double), y: (String, Double)): Int = {
                val c = java.lang.Double.compare(y._2, x._2) // desc, NaN first
                if (c != 0) c else x._1.compareTo(y._1)
              }
            }).take(k)
        }
      }

    val fm = ftsLeg.map { case (id, b) => s"${id / 1000}:${id % 1000}" -> b }.toMap
    val vm = vecLeg.toMap
    val fused = (fm.keySet ++ vm.keySet).toSeq.sorted.map { vk =>
      val bm25 = fm.getOrElse(vk, 0.0)
      val vs = vm.getOrElse(vk, 0.0)
      val b = math.max(0.0, bm25)
      val fts = roundHalfUp(b / (1.0 + b), 6)
      val score = roundHalfUp(wv * vs + wf * fts, 6) // F15 quranTotal
      (vk, bm25, vs, fts, score)
    }
    val backfilled = fused.flatMap { case (vk, bm25, vs, fts, score) =>
      L.docs.getOrElse(vk, Array.empty[VerseMeta]).map { m =>
        (QuranHit(vk, m.surah, m.ayah, roundHalfUp(score, 6),
          roundHalfUp(vs, 6), roundHalfUp(fts, 6),
          substrCp(m.textPlain, 200)), bm25)
      }
    }
    // T4: global sort by the dedupe window's ORDER, first-wins per text
    // block — equivalent to row_number()=1 over partitionBy(md5(preview))
    // followed by the same final ORDER BY.
    val sorted = backfilled.sorted(new Ordering[(QuranHit, Double)] {
      def compare(x: (QuranHit, Double), y: (QuranHit, Double)): Int = {
        var c = java.lang.Double.compare(y._1.score, x._1.score) // desc, NaN first
        if (c == 0) c = java.lang.Double.compare(y._2, x._2)
        if (c == 0) c = Integer.compare(x._1.surah, y._1.surah)
        if (c == 0) c = Integer.compare(x._1.ayah, y._1.ayah)
        c
      }
    })
    val seen = scala.collection.mutable.HashSet.empty[Option[String]]
    val out = scala.collection.mutable.ArrayBuffer.empty[QuranHit]
    val it = sorted.iterator
    while (out.size < n && it.hasNext) {
      val (h, _) = it.next()
      if (seen.add(Option(h.textPreview))) out += h
    }
    out.toSeq
  }
}
