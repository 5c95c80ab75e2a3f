package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FTS5 MATCH expression support for the raw tafsir passthrough path —
  * the one reference behavior (r15 verdict "What's missing" #1) that had
  * no equivalent: `search_tafsir` hands the user string VERBATIM to
  * SQLite FTS5 (quran_mcp/search.py:116-127), so `mercy OR forgiveness`,
  * `punishment NOT fear`, `NEAR(patience reward, 8)`, `"most merciful"`
  * phrases and `content:` column scoping all work there, and malformed
  * syntax surfaces as an error STRING in the result envelope (the
  * reference returns `str(sqlite3.OperationalError)`).
  *
  * Design: ONE hand-rolled recursive-descent parser produces a
  * [[FtsMatch.MatchExpr]] AST; the Spark backend compiles it to postings
  * set algebra (AND = semi-join, OR = union, NOT = anti-join, phrase and
  * NEAR = bounded positional verify over the candidate intersection) and
  * the DuckDB oracle backend compiles THE SAME AST to SQL set algebra —
  * parity by construction, not by parallel reimplementation.
  *
  * Grammar (sqlite.org/fts5.html §3, EMPIRICALLY validated in r17
  * against SQLite's own FTS5 — python sqlite3 probes drove every edge
  * rule below; the r16 adjacency restriction turned out NOT to match
  * real FTS5 and was reverted):
  * {{{
  *   query   := orExpr                       // leading '*' = special query
  *   orExpr  := andExpr ('OR' andExpr)*
  *   andExpr := notExpr ('AND'? notExpr)*    // adjacency = implicit AND,
  *                                           // but a '(' after a phrase errors
  *   notExpr := unit ('NOT' unit)*           // binary a-but-not-b
  *   unit    := '(' orExpr ')' | 'NEAR' '(' chain+ (',' N)? ')'
  *            | [colname ':'] chain | '^' chain | chain
  *   chain   := atom ('+' atom)*             // '+' = colocation: merges
  *                                           // atoms into ONE phrase
  *   atom    := '"' tokens '"' ['*'] | bareword ['*']
  * }}}
  * Validated edge semantics:
  *   - a trailing `*` makes the LAST token of the preceding atom a
  *     prefix stem; whitespace before the star is irrelevant
  *     (`alpha *` ≡ `alpha*` — real FTS5 attaches it), but a star not
  *     after an atom (`quick OR *`, `(a)*`) is a syntax error, and a
  *     star at the very START of the query is FTS5's special-query
  *     path (`unknown special query: …`);
  *   - `^` anchors the NEXT chain (whitespace irrelevant); `^` at end
  *     of input errors near "";
  *   - `+` merges atoms into one phrase with stems allowed at ANY
  *     position (`qui* + brown` matches qui…-then-brown adjacently);
  *   - a bare `NEAR` not followed by `(` is the ordinary term "near";
  *     AND/OR/NOT are ALWAYS operators (quote them to search them);
  *     keywords are UPPERCASE-only — lowercase `or` is a term;
  *   - NEAR takes ≥1 operand (a single operand degrades to the operand
  *     itself); its window parses with C-int decimal accumulation, so
  *     an over-int literal WRAPS exactly like FTS5's
  *     (`NEAR(a b, 99999999999)` behaves as window 1215752191,
  *     `NEAR(a b, 2147483648)` goes negative and matches nothing);
  *   - an empty phrase `""` is a DROPPED operand inside AND/OR/NEAR/
  *     `+`-chains and a matches-nothing result when it IS the query
  *     (or the left side of NOT);
  *   - a phrase followed by `(` is a syntax error (`quick (dog)`).
  * The reference's FTS table indexes ONE column (`content` —
  * search.py:59-64), so `content:` scoping is a no-op and any other
  * column name errors with FTS5's own `no such column: x`.
  *
  * Scale shape: every term probe is a filter over the term-clustered
  * postings layer (batch/bucket pruning — the [[Bm25.score]] doctrine);
  * set algebra is doc_id joins; phrase/NEAR verification tokenizes ONLY
  * the docs that already contain every constituent term (a semi-joined
  * candidate set bounded by the rarest term's df), never the corpus;
  * anchored atoms check doc-head tokens row-locally (no explode). */
object FtsMatch {

  /** One positional element of a phrase: an exact token, or (stem =
    * true) a prefix stem matching any index term that starts with it. */
  final case class PTok(t: String, stem: Boolean = false)

  sealed trait MatchExpr
  /** Adjacent positional elements (a single exact element = a plain
    * term; a single stem = a prefix query; stems may sit anywhere —
    * `+`-chains and phrase-prefixes produce them). */
  final case class Phrase(elems: Seq[PTok]) extends MatchExpr
  /** An empty phrase `""` — a neutral operand FTS5 drops from
    * AND/OR/NEAR/`+`; a whole query reduced to this matches nothing. */
  case object Ignored extends MatchExpr
  /** Matches nothing (e.g. `"" NOT x` after simplification). */
  case object MatchNone extends MatchExpr
  /** FTS5 initial-token anchor `^chain`: the phrase must start at
    * token position 0 of the column. */
  final case class First(e: MatchExpr) extends MatchExpr
  final case class And(l: MatchExpr, r: MatchExpr) extends MatchExpr
  final case class Or(l: MatchExpr, r: MatchExpr) extends MatchExpr
  /** Binary FTS5 NOT: docs matching `l` but not `r`. */
  final case class Not(l: MatchExpr, r: MatchExpr) extends MatchExpr
  /** NEAR(p1 p2 …, n): all operands occur within a window of
    * n + Σ len(p_i) tokens (FTS5's span rule; default n = 10). */
  final case class Near(ops: Seq[MatchExpr], n: Int) extends MatchExpr

  /** Convenience constructors (specs, docs). */
  def term(t: String): Phrase = Phrase(Seq(PTok(t)))
  def prefix(p: String): Phrase = Phrase(Seq(PTok(p, stem = true)))
  def phrase(ts: String*): Phrase = Phrase(ts.map(PTok(_)))

  /** The default NEAR window (FTS5 §3: "NEAR(... )" ≡ ", 10"). */
  val DefaultNear = 10

  // ---- lexer ----

  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object Comma extends Tok
  private case object Colon extends Tok
  private case object Star extends Tok
  private case object Caret extends Tok
  private case object Plus extends Tok
  private final case class Str(s: String) extends Tok
  private final case class Word(s: String) extends Tok

  private def isWordChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c >= 0x80

  private def lex(q: String): Either[String, List[Tok]] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    // a '*' before anything else is FTS5's special-query syntax
    // (`*reads` etc.) — surface its own error shape, not a syntax error
    while (i < q.length && q.charAt(i).isWhitespace) i += 1
    if (i < q.length && q.charAt(i) == '*')
      return Left("unknown special query: " +
        graft.sources.HtmlDom.pyStrip(q.substring(i + 1)))
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == ',') { out += Comma; i += 1 }
      else if (c == ':') { out += Colon; i += 1 }
      else if (c == '*') { out += Star; i += 1 }
      else if (c == '^') { out += Caret; i += 1 }
      else if (c == '+') { out += Plus; i += 1 }
      else if (c == '"') {
        // FTS5 strings use the SQL doubled-quote escape: "" inside a
        // quoted string is one literal '"' in the body (r17 ADVICE —
        // '"quick""dog"' is the single phrase 'quick dog', not two
        // adjacent phrases; probed against real FTS5, fuzz-pinned)
        val sb = new StringBuilder
        var j = i + 1
        var closed = false
        while (j < q.length && !closed) {
          val ch = q.charAt(j)
          if (ch == '"') {
            if (j + 1 < q.length && q.charAt(j + 1) == '"') { sb += '"'; j += 2 }
            else { closed = true; j += 1 }
          } else { sb += ch; j += 1 }
        }
        if (!closed) return Left("fts5: syntax error: unterminated string")
        out += Str(sb.toString); i = j
      } else if (isWordChar(c)) {
        val start = i
        while (i < q.length && isWordChar(q.charAt(i))) i += 1
        out += Word(q.substring(start, i))
      } else return Left(s"""fts5: syntax error near "$c"""")
    }
    Right(out.toList)
  }

  // ---- parser ----

  /** Parse a MATCH expression. Left = the error string a caller
    * surfaces in its result envelope (the reference's
    * `str(sqlite3.OperationalError)` analog). The result is already
    * [[simplify]]-ed (empty phrases dropped per FTS5's rules). */
  def parse(q: String): Either[String, MatchExpr] =
    lex(q).flatMap { toks =>
      val p = new Parser(toks)
      p.orExpr().flatMap { e =>
        if (p.rest.nonEmpty) Left(syntaxError(p.rest))
        else Right(simplify(e))
      }
    }

  private def syntaxError(rest: List[Tok]): String = {
    val near = rest.headOption.map {
      case Word(s) => s; case Str(s) => s"\"$s\""; case LP => "("
      case RP => ")"; case Comma => ","; case Colon => ":"
      case Star => "*"; case Caret => "^"; case Plus => "+"
    }.getOrElse("")
    s"""fts5: syntax error near "$near""""
  }

  private final class Parser(var rest: List[Tok]) {
    private def peekWord(s: String): Boolean = rest.headOption.contains(Word(s))
    private def eat(): Tok = { val h = rest.head; rest = rest.tail; h }
    // FTS5's implicit AND is a PHRASE-sequence production: a
    // parenthesized group cannot juxtapose on either side (validated:
    // `quick (dog)` and `(dog OR cat) quick` both error; explicit
    // AND/OR/NOT around groups is fine)
    private var lastUnitParen = false

    def orExpr(): Either[String, MatchExpr] =
      andExpr().flatMap { l =>
        var acc = l
        while (peekWord("OR")) {
          eat()
          andExpr() match {
            case Left(e) => return Left(e)
            case Right(r) => acc = Or(acc, r)
          }
        }
        Right(acc)
      }

    def andExpr(): Either[String, MatchExpr] =
      notExpr().flatMap { l =>
        var acc = l
        while (peekWord("AND")) {
          eat()
          notExpr() match {
            case Left(e) => return Left(e)
            case Right(r) => acc = And(acc, r)
          }
        }
        Right(acc)
      }

    def notExpr(): Either[String, MatchExpr] =
      seqExpr().flatMap { l =>
        var acc = l
        while (peekWord("NOT")) {
          eat()
          seqExpr() match {
            case Left(e) => return Left(e)
            case Right(r) => acc = Not(acc, r)
          }
        }
        Right(acc)
      }

    /** One JUXTAPOSITION sequence — FTS5's phrase-list production,
      * which binds TIGHTER than NOT/AND/OR (fuzz-validated:
      * `lazy NOT the* "x y"` ≡ `lazy NOT (the* AND "x y")`). Empty
      * `""` units DROP here (neutral inside a sequence); a sequence of
      * only empties is Ignored — which the explicit operators then
      * treat as matches-nothing ([[simplify]]). A parenthesized group
      * can only stand ALONE in a sequence (juxtaposed parens error on
      * either side — `quick (dog)` and `(a OR b) quick`). */
    private def seqExpr(): Either[String, MatchExpr] = {
      var units = Vector.empty[MatchExpr]
      var cont = true
      unit() match {
        case Left(e) => return Left(e)
        case Right(u) => units :+= u
      }
      while (cont) rest.headOption match {
        case Some(Word("AND")) | Some(Word("OR")) | Some(Word("NOT")) |
             Some(RP) | Some(Comma) | None => cont = false
        // juxtaposition never opens NOR follows a group
        case Some(LP) => return Left(syntaxError(rest))
        case Some(_) if lastUnitParen => return Left(syntaxError(rest))
        case Some(_) =>
          unit() match {
            case Left(e) => return Left(e)
            case Right(u) => units :+= u
          }
      }
      // per-unit simplification BEFORE the drop: NEAR of only-empties
      // and ^"" reduce to Ignored and must drop from the sequence like
      // a bare "" (fuzz-validated: `lazy* NEAR("", 5)` ≡ `lazy*`)
      val real = units.map(simplify).filterNot(_ == Ignored)
      if (real.isEmpty) Right(Ignored)
      else Right(real.reduceLeft(And(_, _)))
    }

    def unit(): Either[String, MatchExpr] = {
      lastUnitParen = false // the LP arm re-sets it after its group closes
      unit0()
    }

    private def unit0(): Either[String, MatchExpr] = rest match {
      case LP :: _ =>
        eat()
        orExpr().flatMap { e =>
          rest match {
            case RP :: _ =>
              eat(); lastUnitParen = true; Right(e)
            case other => Left(syntaxError(other))
          }
        }
      // NEAR is special ONLY when directly followed by '(' — a bare
      // NEAR is the ordinary term "near" (validated against FTS5)
      case Word("NEAR") :: LP :: _ =>
        eat(); eat(); nearBody()
      case Word(w) :: Colon :: _ =>
        // column filter: the reference's FTS table indexes only
        // `content` (search.py:59-64) — any other name is FTS5's
        // "no such column" error (unindexed columns cannot be matched)
        eat(); eat()
        if (!w.equalsIgnoreCase("content")) Left(s"no such column: $w")
        else rest match {
          case LP :: _ => unit() // content:(...) — scope is a no-op
          case _ => chain()
        }
      case Caret :: _ =>
        // initial-token anchor applies to the whole '+'-chain
        // (`^the + quick` anchors "the quick"); ^"" stays Ignored
        eat()
        chain().map {
          case Ignored => Ignored
          case p => First(p)
        }
      case (Word(_) | Str(_)) :: _ => chain()
      case other => Left(syntaxError(other))
    }

    /** atom ('+' atom)* — FTS5's colocation operator: the chain's
      * atoms merge into ONE phrase (stems keep their positions; empty
      * `""` atoms are dropped, and an all-empty chain is Ignored). */
    private def chain(): Either[String, MatchExpr] =
      atom().flatMap { first =>
        var elems: Vector[PTok] = first match {
          case Phrase(es) => es.toVector
          case _ => Vector.empty // Ignored
        }
        var sawReal = first.isInstanceOf[Phrase]
        while (rest.headOption.contains(Plus)) {
          eat()
          atom() match {
            case Left(e) => return Left(e)
            case Right(Phrase(es)) => elems ++= es; sawReal = true
            case Right(_) => // "" element: dropped
          }
        }
        if (!sawReal && elems.isEmpty) Right(Ignored)
        else if (elems.isEmpty) Right(Ignored)
        else Right(Phrase(elems))
      }

    /** One quoted or bare atom, with an optional trailing `*` turning
      * its LAST token into a stem (whitespace before the star is
      * irrelevant — the lexer dropped it, matching FTS5). */
    private def atom(): Either[String, MatchExpr] =
      if (rest.isEmpty) Left(syntaxError(Nil)) else eat() match {
        case Word(w) if Seq("AND", "OR", "NOT").contains(w) =>
          // AND/OR/NOT are ALWAYS operators (NEAR already routed: a
          // bare NEAR word reaches here and falls through as a term)
          Left(s"""fts5: syntax error near "$w"""")
        case Word(w) => withStar(graft.Router.embedTokens(w)) match {
          case None => Left(s"""fts5: syntax error near "$w"""")
          case Some(e) => Right(e)
        }
        case Str(s) => withStar(graft.Router.embedTokens(s)) match {
          case None => Right(Ignored) // empty phrase "" — dropped operand
          case Some(e) => Right(e)
        }
        case t => Left(syntaxError(t :: rest))
      }

    /** Attach a pending `*` to the last token; None for empty input. */
    private def withStar(ts: Seq[String]): Option[MatchExpr] = {
      val star = rest.headOption.contains(Star)
      if (star) eat()
      if (ts.isEmpty) {
        // `""*` is still the dropped empty phrase
        if (star) () // star consumed either way
        None
      } else {
        val elems = ts.map(PTok(_))
        Some(Phrase(
          if (star) elems.init :+ elems.last.copy(stem = true) else elems))
      }
    }

    private def nearBody(): Either[String, MatchExpr] = {
      var ops = List.empty[MatchExpr]
      var raw = 0
      var done = false
      while (!done) rest match {
        case (Word(_) | Str(_)) :: _ =>
          // a bare NEAR word inside the operand list is a term too;
          // NEAR(...) nested would hit the LP below and error — FTS5
          // operands are phrases only
          chain() match {
            case Left(e) => return Left(e)
            case Right(p) => ops ::= p; raw += 1
          }
        case _ => done = true
      }
      if (raw < 1)
        return Left(syntaxError(rest))
      val n = rest match {
        case Comma :: Word(d) :: _ if d.forall(_.isDigit) && d.nonEmpty =>
          eat(); eat()
          // C-int decimal accumulation — WRAPS exactly like FTS5's
          // parser on over-int windows (validated: 99999999999 behaves
          // as 1215752191; 2147483648 goes negative → matches nothing)
          d.foldLeft(0)((a, c) => a * 10 + (c - '0'))
        case Comma :: other => return Left(syntaxError(other))
        case _ => DefaultNear
      }
      rest match {
        case RP :: _ => eat(); Right(Near(ops.reverse, n))
        case other => Left(syntaxError(other))
      }
    }
  }

  /** FTS5's empty-phrase algebra (fuzz-validated against SQLite): `""`
    * units DROP from juxtaposition sequences, NEAR operand lists, and
    * `+` chains (that drop happens at parse time — `quick ""` ≡
    * `quick`, `NEAR(quick "", 5)` ≡ `quick`, `lazy* NEAR("", 5)` ≡
    * `lazy*`), but an all-empty sequence reaching an EXPLICIT operator
    * position matches NOTHING (`^"" AND cat` → ∅, `"" NOT quick` → ∅,
    * `"" OR quick` ≡ `quick`) — Ignored converts to MatchNone there,
    * then MatchNone propagates (x AND ∅ = ∅; x OR ∅ = x; ∅ NOT x = ∅;
    * x NOT ∅ = x). A whole query that reduces to Ignored matches
    * nothing too. */
  def simplify(e: MatchExpr): MatchExpr = e match {
    case And(l, r) => (operand(l), operand(r)) match {
      case (MatchNone, _) | (_, MatchNone) => MatchNone
      case (a, b) => And(a, b)
    }
    case Or(l, r) => (operand(l), operand(r)) match {
      case (MatchNone, x) => x
      case (x, MatchNone) => x
      case (a, b) => Or(a, b)
    }
    case Not(l, r) => (operand(l), operand(r)) match {
      case (MatchNone, _) => MatchNone
      case (x, MatchNone) => x
      case (a, b) => Not(a, b)
    }
    case Near(ops, n) =>
      ops.map(simplify).filterNot(_ == Ignored) match {
        case Seq() => Ignored // drops from a sequence like a bare ""
        case Seq(one) => one  // single operand degrades to itself
        case kept => Near(kept, n)
      }
    case First(i) => simplify(i) match {
      case Ignored => Ignored
      case MatchNone => MatchNone
      case p => First(p)
    }
    case other => other
  }

  /** An operand of an explicit operator: Ignored means matches-nothing
    * there (the juxtaposition drop does NOT apply across operators). */
  private def operand(e: MatchExpr): MatchExpr = simplify(e) match {
    case Ignored => MatchNone
    case x => x
  }

  // ---- analysis shared by both backends ----

  /** What SCORES: everything except right-of-NOT subtrees — FTS5's
    * bm25 ranks on the query's positive phrases. Returns (exact
    * tokens, stems): a stem scores every index term it matches, so it
    * contributes a predicate, not a literal. */
  def positiveAtoms(e: MatchExpr): (Seq[String], Seq[String]) = {
    def rec(e: MatchExpr): (Seq[String], Seq[String]) = e match {
      case Phrase(es) =>
        (es.filterNot(_.stem).map(_.t), es.filter(_.stem).map(_.t))
      case First(i) => rec(i)
      case And(l, r) => comb(rec(l), rec(r))
      case Or(l, r) => comb(rec(l), rec(r))
      case Not(l, _) => rec(l)
      case Near(ops, _) =>
        ops.map(rec).foldLeft((Seq.empty[String], Seq.empty[String]))(comb)
      case _ => (Nil, Nil)
    }
    def comb(a: (Seq[String], Seq[String]), b: (Seq[String], Seq[String])) =
      (a._1 ++ b._1, a._2 ++ b._2)
    val (ts, ps) = rec(e)
    (ts.distinct, ps.distinct)
  }

  /** Back-compat view of [[positiveAtoms]]: the exact positive tokens. */
  def positiveTokens(e: MatchExpr): Seq[String] = positiveAtoms(e)._1

  /** The scoring-term predicate over a `term` column — exact tokens
    * plus any stem matches (ONE derivation; the oracle twin is
    * [[positiveTermPredSql]]). */
  private[graft] def positivePred(e: MatchExpr): Column = {
    val (ts, ps) = positiveAtoms(e)
    (Seq(col("term").isin(ts: _*)).filter(_ => ts.nonEmpty) ++
      ps.map(p => col("term").startsWith(p)))
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  /** DuckDB twin of [[positivePred]]. */
  def positiveTermPredSql(e: MatchExpr): String = {
    val (ts, ps) = positiveAtoms(e)
    val ins =
      if (ts.isEmpty) Nil
      else Seq(s"term IN (${ts.map(t => s"'${sq(t)}'").mkString(", ")})")
    (ins ++ ps.map(p => s"starts_with(term, '${sq(p)}')"))
      .reduceOption((a, b) => s"$a OR $b").getOrElse("FALSE")
  }

  // ---- Spark backend ----

  /** Candidate-doc prune shared by the positional paths — ROW-LOCAL,
    * never a join: every token the tokenizer emits is a contiguous
    * substring of `lower(text_plain)` (ClassTokens splits the lowered
    * text on a separator class), so `lower(text) contains atom` is a
    * sound over-approximation of "doc contains this exact token" and
    * "doc contains a term with this stem prefix"; the conjunction over
    * all of a shape's atoms prunes to a superset of the docs the old
    * postings-driven prefilter kept, and the exact positional verify
    * downstream ([[phraseStarts]] / the anchored head conds) makes the
    * final set identical. The r17 form was a postings aggregate
    * semi-joined against the tokenized docs — correct, but the join
    * SHUFFLES THE TOKEN ARRAYS once planned from honest statistics
    * (measured r18: 49 MB per positional leg, 7× per battery), and a
    * broadcast of the candidate ids is unbounded at corpus scale (the
    * PlanAuditSpec doctrine). The substring prune keeps the whole
    * candidate cut inside the docs scan: one narrow pass, zero
    * exchanges, at any corpus size (guide §2.4/§3). */
  private def prunePred(shapes: Seq[Seq[PTok]]): Column = {
    val lowered = lower(col("text_plain"))
    shapes.flatten.map(_.t).distinct
      .map(a => lowered.contains(lit(a)))
      .reduceOption(_ && _).getOrElse(lit(true))
  }

  /** The RELATIONAL positional layer for phrase/NEAR verification: the
    * candidate docs (pruned row-locally by [[prunePred]] to docs whose
    * lowered text contains every constituent atom) posexplode into
    * (doc_id, pos, term) rows KEPT ONLY for the query's own tokens and
    * stem matches. Everything downstream is codegen'd equi-joins over
    * this tiny frame. (The first cut verified positions with nested
    * higher-order-function lambdas per row — interpreted evaluation
    * over multi-thousand-token tafsir docs measured 240-400 SECONDS
    * per leg; the join form runs the same legs in under a second.) */
  private def positionsOf(idx: Quran.Index,
                          shapes: Seq[Seq[PTok]]): DataFrame = {
    val exacts = shapes.flatten.filterNot(_.stem).map(_.t).distinct
    val stems = shapes.flatten.filter(_.stem).map(_.t).distinct
    val keep = (Seq(col("term").isin(exacts: _*))
        .filter(_ => exacts.nonEmpty) ++
      stems.map(p => col("term").startsWith(p)))
      .reduce(_ || _)
    // the SHARED tokenized-docs layer (idx.docsTokens, cached): before
    // r19 this re-tokenized the pruned candidate subset per positional
    // leg — the 11-leg battery paid the corpus tokenize ~7× (guide
    // §2.4, compute shared layers once). The row-local substring prune
    // is unchanged (docsTokens carries text_plain for it).
    idx.docsTokens.where(prunePred(shapes))
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "term")))
      .where(keep)
  }

  /** (doc_id, start) occurrences of a positional shape — element j's
    * positions shifted by −j and intersected, so only aligned runs
    * survive (the inverted-index phrase join). A stem element
    * contributes the positions of ANY matching term at its slot. */
  private def phraseStarts(pos: DataFrame, elems: Seq[PTok]): DataFrame =
    elems.zipWithIndex.map { case (e, j) =>
      pos.where(if (e.stem) col("term").startsWith(e.t)
                else col("term") === e.t)
        .select(col("doc_id"), (col("pos") - lit(j)).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start"))).distinct()

  private def elemsOf(e: MatchExpr): Seq[PTok] = e match {
    case Phrase(es) => es
    case _ => Seq.empty
  }

  /** Compile the (simplified) AST to a (doc_id) candidate frame.
    *
    * MULTISET CONTRACT (r18): the returned frame can carry DUPLICATE
    * doc_id rows — stem atoms emit one row per matching term, phrase/
    * NEAR arms one per occurrence, OR arms a plain union. Consumers
    * must be duplicate-safe: a semi/anti join right side, a set union
    * re-read the same way, or a driver-side dedupe (FtsDiff sorts +
    * dedupes). Counting rows or joining INNER against this frame
    * inflates cardinality silently — add a `.distinct()` at the call
    * site if set semantics are needed (each internal distinct the r18
    * optimization dropped was one exchange+stage per battery leg). */
  def candidates(idx: Quran.Index, e: MatchExpr): DataFrame = e match {
    case Ignored | MatchNone =>
      idx.postings.where(lit(false)).select("doc_id")
    case Phrase(Seq(PTok(t, false))) =>
      idx.postings.where(col("term") === t).select("doc_id")
    case Phrase(Seq(PTok(p, true))) =>
      // startsWith prunes term-clustered batches / pushes to parquet
      // like the exact probe; a doc can match several stemmed terms —
      // the duplicates are harmless: every candidates() consumer is a
      // semi/anti join right side or a set union re-read the same way
      // (FtsDiff dedupes driver-side), and each dropped distinct is one
      // less exchange+stage per leg (r18; guide §2.4 — remove shuffles
      // a downstream semi join makes redundant)
      idx.postings.where(col("term").startsWith(p))
        .select("doc_id")
    case First(inner) =>
      // anchored atoms need positions ONLY at the doc head: check the
      // first |elems| tokens with row-local element_at instead of
      // posexploding every occurrence of (often ubiquitous — `^alla*`)
      // constituent terms across the candidate corpus. Same head-slice
      // form as the oracle twin; an out-of-range element_at is NULL
      // and the condition filters it (doc shorter than the phrase).
      val elems = elemsOf(inner)
      val conds = elems.zipWithIndex.map { case (e2, j) =>
        if (e2.stem) element_at(col("t"), j + 1).startsWith(e2.t)
        else element_at(col("t"), j + 1) === e2.t
      }
      // head check over the shared tokenized-docs layer (see
      // positionsOf) — same row-local prune + element_at conditions,
      // minus the per-leg re-tokenize
      idx.docsTokens.where(prunePred(Seq(elems)))
        .where(conds.reduce(_ && _))
        .select("doc_id")
    case Phrase(elems) =>
      // multiple phrase occurrences per doc leave duplicate ids —
      // dup-safe downstream (see the stem case note)
      phraseStarts(positionsOf(idx, Seq(elems)), elems)
        .select("doc_id")
    case And(l, r) =>
      candidates(idx, l).join(candidates(idx, r), Seq("doc_id"), "left_semi")
    case Or(l, r) =>
      // plain union — dup-safe downstream (see the stem case note)
      candidates(idx, l).union(candidates(idx, r))
    case Not(l, r) =>
      candidates(idx, l).join(candidates(idx, r), Seq("doc_id"), "left_anti")
    case Near(ops, n) =>
      // one (doc_id, s_k) frame per operand, joined per doc; the FTS5
      // window rule span(max end − min start + 1) ≤ n + Σ lengths over
      // the occurrence combinations. Per-doc fan-out is the product of
      // the operands' occurrence counts of the QUERY's own terms in one
      // doc — bounded planning-size data, and the span filter runs
      // inside codegen.
      val shapes = ops.map(elemsOf)
      val pos = positionsOf(idx, shapes)
      val frames = shapes.zipWithIndex.map { case (es, k) =>
        phraseStarts(pos, es).withColumnRenamed("start", s"s$k")
      }
      val joined = frames.reduce((a, b) => a.join(b, "doc_id"))
      val starts = shapes.indices.map(k => col(s"s$k"))
      val ends = shapes.zipWithIndex.map { case (es, k) =>
        col(s"s$k") + lit(es.length - 1)
      }
      val budget = n.toLong + shapes.map(_.length).sum
      joined
        .where(greatest(ends: _*) - least(starts: _*) + lit(1) <= lit(budget))
        .select("doc_id") // dup-safe downstream (see the stem case note)
  }

  /** MATCH search over a quran index: candidates by set algebra, ranked
    * by BM25 over the query's positive tokens (restricted to the
    * candidate set), top n by (bm25 desc, doc_id). Left = the FTS5-style
    * error string for malformed syntax — callers surface it in their
    * envelope exactly as the reference surfaces the
    * sqlite3.OperationalError text (search.py:125-127).
    *
    * ACCEPTED DIVERGENCE (ranking only — ADVICE r16): candidate SETS
    * match SQLite FTS5 exactly (that is what the oracle battery pins),
    * but the ORDER within a result page uses the framework's
    * Lucene-style token-level BM25 (+1-smoothed IDF, descending), while
    * FTS5's built-in `bm25()` uses raw Robertson IDF with PHRASE-level
    * term frequency and sorts by rank ascending. A quoted phrase is
    * therefore scored here as its constituent tokens, not as one unit —
    * the same hit set can page in a different order than the reference
    * for multi-token MATCH queries. Engine↔oracle ranking parity IS
    * pinned (both backends rank identically); reference-ranking parity
    * is intentionally not a goal, matching the framework-wide scoring
    * doctrine ([[Bm25]] scaladoc). */
  def search(idx: Quran.Index, matchQuery: String,
             n: Int): Either[String, DataFrame] =
    parse(matchQuery).map { ast =>
      val cand = candidates(idx, ast)
      Bm25.scoreMatching(idx.postings, idx.dict, idx.stats, positivePred(ast))
        .join(cand, Seq("doc_id"), "left_semi")
        .orderBy(desc("bm25"), asc("doc_id")).limit(n)
        .select(
          concat((col("doc_id") / 1000).cast("long"), lit(":"),
            pmod(col("doc_id"), lit(1000)).cast("long")).as("verse_key"),
          (col("doc_id") / 1000).cast("long").as("surah"),
          pmod(col("doc_id"), lit(1000)).cast("long").as("ayah"),
          col("bm25"))
    }

  // ---- DuckDB oracle backend (same AST — parity by construction) ----

  private def sq(s: String): String = s.replace("'", "''")

  /** DuckDB start-position list of a positional shape over token list
    * column `t` (the toks CTE) — `range` is exclusive-end and yields
    * [] when the doc is shorter than the shape, mirroring the Spark
    * guard. */
  private def phrasePosSql(elems: Seq[PTok]): String = {
    val conj = elems.zipWithIndex.map { case (e, j) =>
      if (e.stem) s"starts_with(t[i+$j], '${sq(e.t)}')"
      else s"t[i+$j]='${sq(e.t)}'"
    }.mkString(" AND ")
    s"list_filter(range(1, len(t)-${elems.length - 1}+1), i -> $conj)"
  }

  /** The candidate-set subquery for an AST node (doc_id rows), over the
    * CTE names the quran oracles establish: `p` (postings) and `toks`
    * (doc_id, t token list). */
  def candSql(e: MatchExpr): String = e match {
    case Ignored | MatchNone =>
      "(SELECT doc_id FROM p WHERE FALSE)"
    case Phrase(Seq(PTok(t, false))) =>
      s"(SELECT doc_id FROM p WHERE term='${sq(t)}')"
    case Phrase(Seq(PTok(p, true))) =>
      s"(SELECT DISTINCT doc_id FROM p WHERE starts_with(term, '${sq(p)}'))"
    case First(inner) =>
      val conj = elemsOf(inner).zipWithIndex.map { case (e2, j) =>
        if (e2.stem) s"starts_with(t[${j + 1}], '${sq(e2.t)}')"
        else s"t[${j + 1}]='${sq(e2.t)}'"
      }.mkString(" AND ")
      s"(SELECT doc_id FROM toks WHERE $conj)"
    case Phrase(elems) =>
      s"(SELECT doc_id FROM toks WHERE len(${phrasePosSql(elems)}) > 0)"
    case And(l, r) => s"(${candSql(l)} INTERSECT ${candSql(r)})"
    case Or(l, r) => s"(${candSql(l)} UNION ${candSql(r)})"
    case Not(l, r) => s"(${candSql(l)} EXCEPT ${candSql(r)})"
    case Near(ops, n) =>
      val shapes = ops.map(elemsOf)
      val budget = n.toLong + shapes.map(_.length).sum
      def rec(i: Int, starts: Seq[String]): String =
        if (i == shapes.length) {
          val ends = starts.zip(shapes)
            .map { case (s, es) => s"$s+${es.length - 1}" }.mkString(", ")
          s"(greatest(${ends}) - least(${starts.mkString(", ")}) + 1) <= $budget"
        } else {
          val v = s"x$i"
          s"len(list_filter(${phrasePosSql(shapes(i))}, $v -> ${rec(i + 1, starts :+ v)})) > 0"
        }
      s"(SELECT doc_id FROM toks WHERE ${rec(0, Nil)})"
  }
}
