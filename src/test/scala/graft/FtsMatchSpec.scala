package graft

import graft.operators.{FtsMatch, Quran}
import graft.operators.FtsMatch._

/** FTS5 MATCH syntax (r16, grammar EMPIRICALLY re-validated in r17
  * against SQLite's own FTS5 via python sqlite3 probes — every edge
  * expectation below reproduces an observed real-FTS5 behavior):
  * parse/precedence pins, the FTS5-style error strings the result
  * envelope surfaces (the reference returns
  * str(sqlite3.OperationalError) — search.py:125-127), and engine-level
  * semantics over a tiny known corpus where every answer is countable
  * by hand AND was replayed through real FTS5. The registered
  * `quran_match_syntax` row oracle-checks the same compiler end-to-end
  * against DuckDB set algebra. */
class FtsMatchSpec extends SparkSpec {

  // ---- parser ----

  test("precedence: juxtaposition > NOT > AND > OR, left-associative") {
    // a b OR c  ⇒  (a AND b) OR c
    assert(parse("alpha beta OR gamma") ===
      Right(Or(And(term("alpha"), term("beta")), term("gamma"))))
    // a NOT b c  ⇒  a NOT (b c) — the juxtaposition SEQUENCE binds
    // tighter than NOT (fuzz-validated: `lazy NOT far "qui"` returns
    // the lazy docs in real FTS5, i.e. lazy NOT (far AND "qui"))
    assert(parse("alpha NOT beta gamma") ===
      Right(Not(term("alpha"), And(term("beta"), term("gamma")))))
    // …but explicit AND binds LOOSER than NOT
    assert(parse("alpha NOT beta AND gamma") ===
      Right(And(Not(term("alpha"), term("beta")), term("gamma"))))
    // parens override — with an EXPLICIT operator (juxtaposed groups
    // are FTS5 syntax errors, validated in r17; the pre-r17 pin here
    // accepted `alpha (beta OR gamma)`, which real FTS5 rejects)
    assert(parse("alpha AND (beta OR gamma)") ===
      Right(And(term("alpha"), Or(term("beta"), term("gamma")))))
  }

  test("keywords are UPPERCASE-only — lowercase `or` is a search term (FTS5 parity)") {
    assert(parse("mercy or forgiveness") ===
      Right(And(And(term("mercy"), term("or")), term("forgiveness"))))
  }

  test("phrases, NEAR defaults and windows, column scoping") {
    assert(parse("\"most merciful\"") === Right(phrase("most", "merciful")))
    assert(parse("NEAR(alpha beta)") ===
      Right(Near(Seq(term("alpha"), term("beta")), FtsMatch.DefaultNear)))
    assert(parse("NEAR(alpha \"beta gamma\", 3)") ===
      Right(Near(Seq(term("alpha"), phrase("beta", "gamma")), 3)))
    // content: is the one indexed column — scoping it is a no-op
    assert(parse("content:mercy") === Right(term("mercy")))
    assert(parse("content:(alpha OR beta)") ===
      Right(Or(term("alpha"), term("beta"))))
  }

  test("prefix queries and initial-token anchors (r16)") {
    assert(parse("forgiv*") === Right(prefix("forgiv")))
    assert(parse("forgiv* mercy") === Right(And(prefix("forgiv"), term("mercy"))))
    assert(parse("^allah") === Right(First(term("allah"))))
    assert(parse("^\"the quick\"") === Right(First(phrase("the", "quick"))))
    // prefix operands inside NEAR are valid FTS5 (r17)
    assert(parse("NEAR(forgiv* mercy)") ===
      Right(Near(Seq(prefix("forgiv"), term("mercy")), FtsMatch.DefaultNear)))
  }

  test("phrase-prefix `\"a b\"*` forms (r17)") {
    assert(parse("\"most merc\"*") ===
      Right(Phrase(Seq(PTok("most"), PTok("merc", stem = true)))))
    assert(parse("\"a b c\"*") ===
      Right(Phrase(Seq(PTok("a"), PTok("b"), PTok("c", stem = true)))))
    // one-token quoted prefix degenerates to a bare prefix
    assert(parse("\"merc\"*") === Right(prefix("merc")))
    // composes with the anchor and with set algebra
    assert(parse("^\"the qui\"*") ===
      Right(First(Phrase(Seq(PTok("the"), PTok("qui", stem = true))))))
    assert(parse("^alla*") === Right(First(prefix("alla"))))
    assert(parse("\"most merc\"* OR mercy") ===
      Right(Or(Phrase(Seq(PTok("most"), PTok("merc", stem = true))),
        term("mercy"))))
  }

  test("real-FTS5 edge rules: detached star/caret ATTACH; bad stars error") {
    // validated against sqlite: whitespace between atom and star is
    // irrelevant — the star attaches (`quick *` ≡ `quick*`)
    assert(parse("quick *") === Right(prefix("quick")))
    assert(parse("\"brown fox\" *") ===
      Right(Phrase(Seq(PTok("brown"), PTok("fox", stem = true)))))
    assert(parse("^ quick") === Right(First(term("quick"))))
    // a star NOT after an atom is the FTS5 syntax error
    Seq("quick OR *", "cat AND *", "(quick) *", "quick + *").foreach { q =>
      val r = parse(q)
      assert(r === Left("""fts5: syntax error near "*""""), s"'$q' → $r")
    }
    // a star at the very START is FTS5's special-query path
    assert(parse("* quick") === Left("unknown special query: quick"))
    assert(parse("*") === Left("unknown special query: "))
    // dangling carets error near "" / "^" exactly like FTS5
    assert(parse("^") === Left("""fts5: syntax error near """""))
    assert(parse("quick ^") === Left("""fts5: syntax error near """""))
    assert(parse("^ ^quick") === Left("""fts5: syntax error near "^""""))
  }

  test("the + colocation operator builds phrases, stems at any slot (r17)") {
    assert(parse("the + quick + brown") === Right(phrase("the", "quick", "brown")))
    assert(parse("\"the quick\" + brown") === Right(phrase("the", "quick", "brown")))
    assert(parse("the+quick") === Right(phrase("the", "quick")))
    // a stem can sit MID-phrase via + (validated: qui* + brown)
    assert(parse("qui* + brown") ===
      Right(Phrase(Seq(PTok("qui", stem = true), PTok("brown")))))
    assert(parse("\"the qui\"* + brown") ===
      Right(Phrase(Seq(PTok("the"), PTok("qui", stem = true), PTok("brown")))))
    assert(parse("^the + quick") === Right(First(phrase("the", "quick"))))
    // a single-operand NEAR simplifies to the operand (FTS5-equivalent)
    assert(parse("NEAR(the + quick, 1)") === Right(phrase("the", "quick")))
    // malformed chains error like FTS5
    assert(parse("+quick") === Left("""fts5: syntax error near "+""""))
    assert(parse("quick + + dog") === Left("""fts5: syntax error near "+""""))
  }

  test("bare NEAR is a term; empty phrases drop; windows wrap like C ints") {
    // NEAR not followed by '(' is the ordinary term "near" (validated)
    assert(parse("NEAR") === Right(term("near")))
    assert(parse("NEAR dog") === Right(And(term("near"), term("dog"))))
    // single-operand NEAR degrades to the operand
    assert(parse("NEAR(quick, 5)") === Right(term("quick")))
    // "" drops from AND/OR/NEAR/+; alone (or left of NOT) matches nothing
    assert(parse("quick \"\"") === Right(term("quick")))
    assert(parse("\"\" OR quick") === Right(term("quick")))
    assert(parse("\"\" + quick") === Right(term("quick")))
    assert(parse("quick NOT \"\"") === Right(term("quick")))
    assert(parse("NEAR(quick \"\", 5)") === Right(term("quick")))
    assert(parse("\"\"") === Right(Ignored))
    assert(parse("^\"\"") === Right(Ignored))
    assert(parse("\"\" NOT quick") === Right(MatchNone))
    assert(parse("NEAR(\"\")") === Right(Ignored))
    // an all-empty sequence at an EXPLICIT operator position matches
    // NOTHING (fuzz-validated: `^"" AND cat` → ∅ in real FTS5), while
    // the same unit DROPS from a juxtaposition (`quick ^""` ≡ quick)
    assert(parse("^\"\" AND cat") === Right(MatchNone))
    assert(parse("quick ^\"\"") === Right(term("quick")))
    assert(parse("lazy NEAR(\"\", 5)") === Right(term("lazy")))
    // over-int windows WRAP with C decimal accumulation (validated:
    // FTS5 treats 99999999999 as 1215752191 and 2147483648 as negative)
    assert(parse("NEAR(a b, 99999999999)") ===
      Right(Near(Seq(term("a"), term("b")), 1215752191)))
    assert(parse("NEAR(a b, 2147483648)") ===
      Right(Near(Seq(term("a"), term("b")), Int.MinValue)))
  }

  test("malformed syntax surfaces FTS5-style error strings, never throws") {
    // unknown column — the reference's FTS table indexes only `content`
    assert(parse("surah:5") === Left("no such column: surah"))
    // a '(' after a phrase errors (validated: `quick (dog)`)
    assert(parse("quick (dog)").isLeft)
    assert(parse("near(quick dog)").isLeft) // lowercase near = term, then '('
    // unbalanced / dangling / unterminated — all syntax errors
    Seq("(alpha", "alpha)", "alpha OR", "NOT alpha", "\"unterminated",
      "NEAR(alpha beta, x)", "alpha AND", "", "mercy & x", "AND", "OR")
      .foreach { q =>
        val r = parse(q)
        assert(r.isLeft, s"'$q' should fail to parse, got $r")
        assert(r.swap.exists(e =>
          e.contains("syntax error") || e.contains("no such column")),
          s"'$q' error not FTS5-shaped: $r")
      }
  }

  // ---- engine semantics over a hand-countable corpus (every expected
  // row set below was ALSO replayed through real SQLite FTS5) ----

  private lazy val idx: Quran.Index = {
    import spark.implicits._
    val corpus = Seq(
      (1, 1, "the quick brown fox jumps over the lazy dog"),
      (1, 2, "a quick dog barks at the brown cat"),
      (1, 3, "foxes are quick and dogs are lazy"),
      (2, 1, "the cat sat on the mat"),
      (2, 2, "quick words travel far and quick deeds farther"))
      .map { case (s, a, t) => (s, a, s"$s:$a", t) }
      .toDF("surah", "ayah", "verse_key", "text_plain")
    Quran.buildIndex(corpus, None, cache = false)
  }

  private def keys(mq: String): Seq[String] =
    FtsMatch.search(idx, mq, n = 10)
      .fold(e => fail(s"'$mq' failed: $e"),
        _.select("verse_key").collect().map(_.getString(0)).toSeq.sorted)

  test("set algebra: implicit AND intersects, OR unions, NOT subtracts") {
    assert(keys("quick dog") === Seq("1:1", "1:2")) // both terms required
    assert(keys("fox OR cat") === Seq("1:1", "1:2", "2:1"))
    assert(keys("quick NOT dog") === Seq("1:3", "2:2"))
    // juxtaposed parens error on EITHER side (validated); explicit
    // operators around groups are fine
    assert(FtsMatch.parse("quick (dog OR cat)").isLeft)
    assert(FtsMatch.parse("(dog OR cat) quick").isLeft)
    assert(keys("quick AND (dog OR cat)") === Seq("1:1", "1:2"))
    assert(keys("quick NOT (dog OR cat)") === Seq("1:3", "2:2"))
  }

  test("phrase requires adjacency; NEAR requires the window") {
    assert(keys("\"quick brown\"") === Seq("1:1")) // 1:2 has them apart
    assert(keys("\"brown fox\" OR \"brown cat\"") === Seq("1:1", "1:2"))
    // 'quick ... brown': adjacent in 1:1 (gap 0), 5 tokens apart in 1:2
    assert(keys("NEAR(quick brown, 0)") === Seq("1:1"))
    assert(keys("NEAR(quick brown, 4)") === Seq("1:1", "1:2"))
    // order-independent: brown precedes quick nowhere, same answers
    assert(keys("NEAR(brown quick, 4)") === Seq("1:1", "1:2"))
  }

  test("prefix/anchor semantics over the tiny corpus") {
    assert(keys("fox*") === Seq("1:1", "1:3"))
    assert(keys("fox* dog") === Seq("1:1")) // 1:3 has 'dogs', not 'dog'
    assert(keys("fox* dog*") === Seq("1:1", "1:3"))
    // ^: only docs whose FIRST token matches
    assert(keys("^the") === Seq("1:1", "2:1")) // 'the quick…', 'the cat…'
    assert(keys("^\"the quick\"") === Seq("1:1"))
    assert(keys("^a") === Seq("1:2"))
  }

  test("phrase-prefix semantics: exact run then any term on the stem (r17)") {
    // 'quick d…': "quick dog" (1:2) and "quick deeds" (2:2)
    assert(keys("\"quick d\"*") === Seq("1:2", "2:2"))
    assert(keys("\"quick de\"*") === Seq("2:2"))
    assert(keys("\"quick zz\"*") === Seq())
    assert(keys("\"at the bro\"*") === Seq("1:2"))
    assert(keys("^\"the qui\"*") === Seq("1:1"))
    assert(keys("^fox*") === Seq("1:3"))
    assert(keys("\"quick d\"* NOT barks") === Seq("2:2"))
  }

  test("+ chains and NEAR-prefix operands match real FTS5 row sets (r17)") {
    // validated row sets from the sqlite replay of this exact corpus:
    assert(keys("the + quick") === Seq("1:1"))
    assert(keys("qui* + brown") === Seq("1:1")) // quick@1 brown@2 in 1:1 only
    assert(keys("the + quick + brown") === Seq("1:1"))
    assert(keys("NEAR(fox* lazy, 3)") === Seq("1:1"))
    assert(keys("NEAR(fox* lazy, 5)") === Seq("1:1", "1:3"))
    assert(keys("NEAR(\"quick d\"* far, 1)") === Seq("2:2"))
    assert(keys("NEAR(\"quick d\"* cat, 10)") === Seq("1:2"))
    // detached star attaches: same rows as the glued form
    assert(keys("quick *") === keys("quick*"))
    assert(keys("\"brown fox\" *") === Seq("1:1"))
    // empty phrase drops; bare NEAR is a term (no 'near' in corpus)
    assert(keys("quick \"\"") === keys("quick"))
    assert(keys("\"\"") === Seq())
    assert(keys("NEAR dog") === Seq())
    // single-operand NEAR = the operand; huge window wraps positive
    assert(keys("NEAR(quick, 5)") === keys("quick"))
    assert(keys("NEAR(quick dog, 99999999999)") === Seq("1:1", "1:2"))
    assert(keys("NEAR(quick dog, 2147483648)") === Seq()) // wraps negative
  }

  test("ranking is BM25 over positive tokens, candidates only") {
    val rows = FtsMatch.search(idx, "quick NOT dog", n = 10)
      .toOption.get.collect()
    // 2:2 has tf(quick)=2 — must outrank 1:3's single occurrence
    assert(rows.map(_.getString(0)).toSeq === Seq("2:2", "1:3"))
    assert(rows.forall(r => r.getDouble(3) > 0))
  }
}
