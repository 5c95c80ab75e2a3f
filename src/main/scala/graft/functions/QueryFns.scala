package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Query-router functions F3–F8 as column expressions, so a batch of query
  * strings can be routed in one distributed pass (reference routes one
  * query at a time on the driver: mcp_server/apps/router.py:19-107).
  *
  * The driver-side single-query path ([[graft.Router]]) uses the same
  * regexes; RouterSpec pins the two implementations together.
  */
object QueryFns {

  /** F3: first quoted phrase ≥3 chars — double quotes win over single
    * (reference: router.py:31-38). */
  def quotedPhrase(q: Column): Column =
    coalesce(
      nullif(regexp_extract(q, "\"([^\"]{3,})\"", 1), lit("")),
      nullif(regexp_extract(q, "'([^']{3,})'", 1), lit("")))

  /** F4: strip symmetric outer quotes from the trimmed query
    * (reference: router.py:24-29). */
  def stripQuotes(q: Column): Column = {
    val t = trim(q)
    val quoted = (t.startsWith("\"") && t.endsWith("\"")) ||
      (t.startsWith("'") && t.endsWith("'"))
    when(length(t) >= 2 && quoted, trim(t.substr(lit(2), length(t) - 2))).otherwise(t)
  }

  // Arabic pattern uses (?:^|\s) instead of the reference's \b: Java and
  // RE2 define \b over ASCII word chars, so `\bعن` would never match —
  // Python's unicode \b is approximated portably (divergence only for
  // inputs like "1عن", documented).
  private val NarratedEn = "(?i)\\b(narrated by|reported by|said by)\\b\\s*(.+)$"
  private val NarratedAr = "(?:^|\\s)عن\\s+(.+)$"

  /** F5: narrator extraction — English reporting-verb pattern first, Arabic
    * `عن` fallback, then canonicalization with raw-strip fallback
    * (reference: router.py:62-69 + normalization.py). */
  def narrator(q: Column): Column = {
    val en = nullif(regexp_extract(q, NarratedEn, 2), lit(""))
    val ar = nullif(regexp_extract(q, NarratedAr, 1), lit(""))
    val g = coalesce(en, ar)
    coalesce(TextFns.canonicalize(g), nullif(trim(g), lit("")))
  }

  /** F6: exact-reference detection (reference: router.py:21,71-72). */
  def hasExactRef(q: Column): Column =
    q.rlike("(?i)\\b(?:book|kitab|bk)?\\s*\\d+(?:\\s*[:\\-/]\\s*\\d+)?\\b")

  /** F7: intent classification cascade — exact_reference > narrator >
    * thematic (≥4 tokens or phrase) > mixed (reference: router.py:71-80). */
  def intentType(q: Column): Column = {
    val t = trim(q)
    when(hasExactRef(t), lit("exact_reference"))
      .when(narrator(t).isNotNull, lit("narrator"))
      .when(size(TextFns.routerTokens(t)) >= 4 || quotedPhrase(t).isNotNull, lit("thematic"))
      .otherwise(lit("mixed"))
  }

  /** F8: FTS MATCH compilation (reference: router.py:93-107):
    * narrator → `narrator:t* AND …` (≤6 terms, falling back to query
    * tokens, then to the normalized string); phrase → `"…"`; else
    * `t1* AND …` (≤6) or the normalized string. */
  def ftsMatch(q: Column): Column = {
    val t = trim(q)
    val typ = intentType(t)
    val narr = narrator(t)
    val normalized = stripQuotes(t)
    val itoks = TextFns.routerTokens(normalized)
    val ntoksRaw = TextFns.routerTokens(narr)
    val ntoks = when(size(ntoksRaw) > 0, ntoksRaw).otherwise(itoks)
    val narrParts = array_join(
      transform(slice(ntoks, 1, 6), tk => concat(lit("narrator:"), tk, lit("*"))), " AND ")
    val termParts = array_join(
      transform(slice(itoks, 1, 6), tk => concat(tk, lit("*"))), " AND ")
    val phrase = quotedPhrase(t)
    when(typ === "narrator" && narr.isNotNull,
        when(length(narrParts) > 0, narrParts).otherwise(normalized))
      .when(phrase.isNotNull, concat(lit("\""), phrase, lit("\"")))
      .otherwise(when(size(itoks) > 0, termParts).otherwise(normalized))
  }
}
