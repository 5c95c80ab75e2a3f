package graft

import graft.functions.TextFns

/** Driver-side query routing (reference: mcp_server/apps/router.py:19-107).
  * Planning a single query is driver work, exactly as in the reference; the
  * column-expression twin ([[graft.functions.QueryFns]]) serves batch
  * routing. RouterSpec pins the two together.
  */
object Router {

  final case class Intent(
      qtype: String,
      raw: String,
      normalized: String,
      narrator: Option[String],
      phrase: Option[String],
      tokens: Seq[String])

  private val TokenRe = "[a-z0-9_\u0600-\u06ff]+".r
  private val NarratedEn = "(?i)\\b(narrated by|reported by|said by)\\b\\s*(.+)$".r.unanchored
  // (?:^|\s) replaces \b — see QueryFns note on ASCII \b portability.
  private val NarratedAr = "(?:^|\\s)عن\\s+(.+)$".r.unanchored
  private val ExactRefRe = "(?i)\\b(?:book|kitab|bk)?\\s*\\d+(?:\\s*[:\\-/]\\s*\\d+)?\\b".r.unanchored
  private val Honorific = "(?i)\\((?:may|may allah be pleased|رضي الله عن(?:ه|ها|هم))[^)]*\\)".r
  private val Verb = "(?i)\\b(reported|narrated|said|stated)\\b:?".r

  /** Token stream, len>1 (reference: router.py:41-44). */
  def tokenize(s: String): Seq[String] =
    TokenRe.findAllIn(s.toLowerCase).filter(_.length > 1).toSeq

  /** F1 canonicalization (reference: normalization.py:8-26). */
  def canonicalize(raw: String): Option[String] = {
    val cleaned = Verb.replaceAllIn(Honorific.replaceAllIn(raw, ""), "")
      .replace(":", "").replace("،", "")
      .replaceAll("\\s+", " ")
      .replaceAll("^[ \\-\u200f\u200e\ufeff]+|[ \\-\u200f\u200e\ufeff]+$", "")
    if (cleaned.isEmpty) None else Some(cleaned)
  }

  private def stripQuotes(q: String): String = {
    val t = q.trim
    if (t.length >= 2 &&
      ((t.startsWith("\"") && t.endsWith("\"")) || (t.startsWith("'") && t.endsWith("'"))))
      t.substring(1, t.length - 1).trim
    else t
  }

  private def firstPhrase(q: String): Option[String] =
    "\"([^\"]{3,})\"".r.findFirstMatchIn(q).map(_.group(1))
      .orElse("'([^']{3,})'".r.findFirstMatchIn(q).map(_.group(1)))

  def route(query: String): Intent = {
    val q = query.trim
    val phrase = firstPhrase(q)
    val narrRaw = NarratedEn.findFirstMatchIn(q).map(_.group(2))
      .orElse(NarratedAr.findFirstMatchIn(q).map(_.group(1)))
    val narr = narrRaw.flatMap(r => canonicalize(r).orElse(Some(r.trim).filter(_.nonEmpty)))
    val qtype =
      if (ExactRefRe.findFirstIn(q).isDefined) "exact_reference"
      else if (narr.isDefined) "narrator"
      else if (tokenize(q).size >= 4 || phrase.isDefined) "thematic"
      else "mixed"
    val normalized = stripQuotes(q)
    Intent(qtype, query, normalized, narr, phrase, tokenize(normalized))
  }

  /** F8: MATCH compilation (reference: router.py:93-107). */
  def buildFtsMatch(i: Intent): String = {
    if (i.qtype == "narrator" && i.narrator.isDefined) {
      val nt = tokenize(i.narrator.get) match { case Nil => i.tokens; case ts => ts }
      val parts = nt.take(6).map(t => s"narrator:$t*")
      if (parts.nonEmpty) parts.mkString(" AND ") else i.normalized
    } else i.phrase match {
      case Some(p) if p.length >= 3 => s""""$p""""
      case _ =>
        val ts = i.tokens.take(6)
        if (ts.nonEmpty) ts.map(_ + "*").mkString(" AND ") else i.normalized
    }
  }

  /** All-tokens variant (len>0) used for embedding payloads — matches the
    * document-side tokenizer [[TextFns.tokens]]. */
  def embedTokens(s: String): Seq[String] =
    TokenRe.findAllIn(s.toLowerCase).toSeq

  /** Light morphological stems of one lowercase query token — the
    * "synonym dictionary" feeding the reference's synonym-group coverage
    * API (scoring.py:43, 60-67 — a parameter no reference caller ever
    * passes; TEST_QUERIES.md's 70% coverage target is unreachable without
    * it, measured 0.69 on shipped-token semantics).
    *
    * Because coverage tests tokens as SUBSTRINGS of the text
    * (scoring.py:66 `tok.lower() in t`), useful variants are SHORTER
    * stems, never longer inflections: "praying" → "pray" matches
    * "prayer"/"prays"/"praying" all at once. Rules are ordered,
    * suffix-strip-only, each independently applied to the ORIGINAL token
    * (not chained), keep stems of ≥3 chars, and are deterministic string
    * surgery — the DuckDB oracle replays them verbatim from the raw
    * token. Arabic tokens carry no ASCII suffix, so they pass through
    * unexpanded. */
  def lightStems(t: String): Seq[String] = {
    def vowel(c: Char) = "aeiou".contains(c)
    // strip a suffix, then also un-double a trailing doubled consonant
    // (stopped → stopp → stop, controlling → controll → control)
    def strip(n: Int): Seq[String] = {
      val s = t.dropRight(n)
      val un =
        if (s.length >= 3 && s.last == s(s.length - 2) && !vowel(s.last))
          Seq(s.dropRight(1))
        else Nil
      s +: un
    }
    val out = Seq.newBuilder[String]
    if (t.length == 5 && t.endsWith("ying")) out += t.take(1) + "ie" // lying → lie
    if (t.length >= 5 && t.endsWith("ies")) out += t.dropRight(3) + "y" // charities → charity
    if (t.length >= 6 && t.endsWith("ing")) out ++= strip(3)
    if (t.length >= 5 && t.endsWith("ed")) out ++= strip(2)
    if (t.length >= 7 && t.endsWith("ness")) out += t.dropRight(4) // shyness → shy
    if (t.length >= 6 && t.endsWith("ful")) out += t.dropRight(3) // truthful → truth
    if (t.length >= 7 && (t.endsWith("ance") || t.endsWith("ence")))
      out += t.dropRight(4) // repentance → repent, patience → pati(ent)
    if (t.length >= 6 && t.endsWith("ity")) out += t.dropRight(3) // sincerity → sincer(e)
    if (t.length >= 5 && t.endsWith("es")) out += t.dropRight(2)
    if (t.length >= 4 && t.endsWith("s") && !t.endsWith("ss") &&
      !t.endsWith("us") && !t.endsWith("is")) out += t.dropRight(1)
    if (t.length >= 5 && t.endsWith("y")) out += t.dropRight(1) // modesty → modest
    out.result().filter(s => s.length >= 3 && s != t).distinct
  }

  /** Per-token synonym groups for the group-coverage branch the reference
    * declares but never exercises (scoring.py:57-67): group i = token i
    * plus its [[lightStems]]; a group scores a hit when ANY member is a
    * substring of the text. Expansion is driver-side query planning,
    * exactly like tokenization — the groups ride into the scoring
    * expression as literals. */
  def synonymGroups(tokens: Seq[String]): Seq[Seq[String]] =
    tokens.map(t => t +: lightStems(t))

  /** The serving default's coverage groups for one routed intent — the
    * ONE decision point HadithSearch, Hybrid, the typed Resident twin,
    * and both oracle emitters all share. Quoted-phrase queries ask for
    * exact wording, so they keep singleton groups (expansion there
    * inflates non-phrase candidates past the phrase hit — measured as a
    * phrase-found top-1 regression); everything else expands. */
  def coverageGroups(intent: Intent): Seq[Seq[String]] =
    if (intent.phrase.isDefined) intent.tokens.map(Seq(_))
    else synonymGroups(intent.tokens)

  /** Parsed exact-reference intent for the spec-mode direct lookup
    * (HADITH_SEARCH_SPEC.md:246-287 — the design the shipped reference
    * never implemented; router.py:93-107 sends exact refs through the
    * token probe instead). Three citation shapes:
    *   - collection + global number: "riyadussalihin 680"
    *   - book + in-book number:      "book 1, hadith 3"
    *   - bare book:number:           "1:5"
    */
  final case class ExactRef(collection: Option[String], global: Option[Long],
                            book: Option[Long], num: Option[Long])

  private val CollRef =
    "(?i)\\b(bukhari|muslim|riyadussalihin|riyad\\s+as-salihin|tirmidhi)\\s+(\\d+)\\b".r.unanchored
  private val BookNum = "(?i)\\bbook\\s+(\\d+)\\s*,?\\s+hadith\\s+(\\d+)\\b".r.unanchored
  private val BookColon = "(?<![\\d:])(\\d+)\\s*[:\\-/]\\s*(\\d+)(?![\\d:])".r.unanchored

  def parseExactRef(q: String): Option[ExactRef] =
    CollRef.findFirstMatchIn(q).map { m =>
      // "riyad as-salihin" → slug "riyadussalihin"
      val slug = m.group(1).toLowerCase.replaceAll("\\s+as-", "us")
      ExactRef(Some(slug), Some(m.group(2).toLong), None, None)
    }.orElse(BookNum.findFirstMatchIn(q).map(m =>
      ExactRef(None, None, Some(m.group(1).toLong), Some(m.group(2).toLong))))
      .orElse(BookColon.findFirstMatchIn(q).map(m =>
        ExactRef(None, None, Some(m.group(1).toLong), Some(m.group(2).toLong))))
}
