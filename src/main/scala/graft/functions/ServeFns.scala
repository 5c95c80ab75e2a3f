package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Serving-layer helpers: snippet highlighting, HTML entity unescape,
  * proximity bonus, MATCH quoting (T6/F13/F19/F27). The two string
  * helpers are the repo's ONLY Scala UDFs — SURVEY §7.4 budgets exactly
  * these (no builtin expresses them); everything else stays codegen'd.
  */
object ServeFns {

  /** F19 (full form): HTML entity unescape — named entities the corpora
    * actually contain plus numeric/hex forms
    * (reference: quran_mcp/loader.py:13-21 uses html.unescape). */
  val htmlUnescapeFn: String => String = { s =>
    if (s == null) null
    else {
      val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
        "apos" -> "'", "nbsp" -> " ", "#39" -> "'")
      "&(#x?[0-9a-fA-F]+|[a-zA-Z]+|#39);".r.replaceAllIn(s, m => {
        val e = m.group(1)
        val rep =
          if (e.startsWith("#x") || e.startsWith("#X"))
            try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
            catch { case _: Exception => m.matched }
          else if (e.startsWith("#"))
            try new String(Character.toChars(e.drop(1).toInt))
            catch { case _: Exception => m.matched }
          else named.getOrElse(e, m.matched)
        scala.util.matching.Regex.quoteReplacement(rep)
      })
    }
  }
  val htmlUnescape = udf(htmlUnescapeFn)

  /** T6: FTS5-style snippet — first window of `window` tokens around the
    * first matched term, matches wrapped in [ ], ellipsis when truncated
    * (reference: fts.py:98 snippet(..., '[', ']', '...', 32)). */
  def snippetHighlightFn(window: Int): (String, Seq[String]) => String = { (text, terms) =>
    if (text == null) null
    else {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val lowSet = terms.map(_.toLowerCase).toSet
      def isHit(t: String) = {
        val w = t.toLowerCase.replaceAll("^[^a-z0-9؀-ۿ]+|[^a-z0-9؀-ۿ]+$", "")
        lowSet.contains(w) || lowSet.exists(q => q.endsWith("*") && w.startsWith(q.dropRight(1)))
      }
      val firstHit = toks.indexWhere(isHit)
      val start = if (firstHit < 0) 0 else math.max(0, firstHit - window / 2)
      val slice = toks.slice(start, start + window)
      val marked = slice.map(t => if (isHit(t)) s"[$t]" else t).mkString(" ")
      val pre = if (start > 0) "..." else ""
      val post = if (start + window < toks.length) "..." else ""
      pre + marked + post
    }
  }
  def snippetHighlight(window: Int = 32) = udf(snippetHighlightFn(window))

  /** F13: proximity bonus — bonus when any position of group-0 terms is
    * within `window` token positions of any group-1 term
    * (reference: scoring.py:72-93; dead code there — no caller passes
    * synonym_groups — implemented for spec completeness). Pure column
    * expressions: positions via indexed transform, min-distance via a
    * nested aggregate. */
  def proximityBonus(toks: Column, g0: Column, g1: Column,
                     window: Int, bonus: Double): Column = {
    def positions(g: Column) =
      filter(transform(toks, (t, i) => when(array_contains(g, t), i).otherwise(lit(-1))),
        x => x >= 0)
    val p0 = positions(g0)
    val p1 = positions(g1)
    val minDist = aggregate(p0, lit(Int.MaxValue), (acc, p) =>
      least(acc, aggregate(p1, lit(Int.MaxValue), (a2, q) => least(a2, abs(p - q)))))
    when(size(p0) > 0 && size(p1) > 0 && minDist <= lit(math.max(1, window)), lit(bonus))
      .otherwise(lit(0.0))
  }

  /** F22: is_arabic ratio — arabic chars / alphabetic chars > 0.5
    * (reference: HADITH_SEARCH_SPEC.md:282-286). One ScriptCounts scan
    * instead of four regex passes; same counts. */
  def isArabic(text: Column): Column = {
    val sc = graft.plans.ScriptCounts(text)
    val nAr = sc.getField("n_ar")
    val nAlpha = sc.getField("n_latin") + nAr
    nAlpha > 0 && (nAr.cast("double") / nAlpha) > 0.5
  }

  /** F27: MATCH quoting — wrap in quotes when the term has whitespace
    * (reference: fts_cli.py:21-31). */
  def matchQuote(term: String): String =
    if (term.exists(_.isWhitespace)) "\"" + term.replace("\"", "\"\"") + "\"" else term
}
