package graft

import graft.operators.{FtsMatch, Quran}
import graft.operators.FtsMatch._
import org.apache.spark.sql.functions._

/** FTS5 MATCH syntax (r16 — the raw tafsir passthrough path's operator
  * surface): parse/precedence pins, the FTS5-style error strings the
  * result envelope surfaces (the reference returns
  * str(sqlite3.OperationalError) — search.py:125-127), and engine-level
  * semantics over a tiny known corpus where every answer is countable
  * by hand. The registered `quran_match_syntax` row oracle-checks the
  * same compiler end-to-end against DuckDB set algebra. */
class FtsMatchSpec extends SparkSpec {

  // ---- parser ----

  test("precedence: NOT > AND > OR, left-associative; implicit AND") {
    // a b OR c  ⇒  (a AND b) OR c
    assert(parse("alpha beta OR gamma") ===
      Right(Or(And(Term("alpha"), Term("beta")), Term("gamma"))))
    // a NOT b c  ⇒  (a NOT b) AND c  — NOT binds tighter than AND
    assert(parse("alpha NOT beta gamma") ===
      Right(And(Not(Term("alpha"), Term("beta")), Term("gamma"))))
    // parens override
    assert(parse("alpha (beta OR gamma)") ===
      Right(And(Term("alpha"), Or(Term("beta"), Term("gamma")))))
  }

  test("keywords are UPPERCASE-only — lowercase `or` is a search term (FTS5 parity)") {
    assert(parse("mercy or forgiveness") ===
      Right(And(And(Term("mercy"), Term("or")), Term("forgiveness"))))
  }

  test("phrases, NEAR defaults and windows, column scoping") {
    assert(parse("\"most merciful\"") === Right(Phrase(Seq("most", "merciful"))))
    assert(parse("NEAR(alpha beta)") ===
      Right(Near(Seq(Term("alpha"), Term("beta")), FtsMatch.DefaultNear)))
    assert(parse("NEAR(alpha \"beta gamma\", 3)") ===
      Right(Near(Seq(Term("alpha"), Phrase(Seq("beta", "gamma"))), 3)))
    // content: is the one indexed column — scoping it is a no-op
    assert(parse("content:mercy") === Right(Term("mercy")))
    assert(parse("content:(alpha OR beta)") ===
      Right(Or(Term("alpha"), Term("beta"))))
  }

  test("prefix queries and initial-token anchors (r16)") {
    assert(parse("forgiv*") === Right(Prefix("forgiv")))
    assert(parse("forgiv* mercy") === Right(And(Prefix("forgiv"), Term("mercy"))))
    assert(parse("^allah") === Right(First(Term("allah"))))
    assert(parse("^\"the quick\"") === Right(First(Phrase(Seq("the", "quick")))))
    // dangling star/caret stay loud errors
    Seq("* mercy", "^", "^NOT")
      .foreach { q =>
        assert(parse(q).isLeft, s"'$q' should fail to parse")
      }
    // prefix operands inside NEAR are valid FTS5 (r17)
    assert(parse("NEAR(forgiv* mercy)") ===
      Right(Near(Seq(Prefix("forgiv"), Term("mercy")), FtsMatch.DefaultNear)))
    assert(parse("NEAR(\"quick d\"* far, 1)") ===
      Right(Near(Seq(PhrasePrefix(Seq("quick"), "d"), Term("far")), 1)))
  }

  test("phrase-prefix `\"a b\"*` and attachment rules (r17)") {
    assert(parse("\"most merc\"*") ===
      Right(PhrasePrefix(Seq("most"), "merc")))
    assert(parse("\"a b c\"*") === Right(PhrasePrefix(Seq("a", "b"), "c")))
    // one-token quoted prefix degenerates to a bare prefix
    assert(parse("\"merc\"*") === Right(Prefix("merc")))
    // composes with the anchor and with set algebra
    assert(parse("^\"the qui\"*") ===
      Right(First(PhrasePrefix(Seq("the"), "qui"))))
    assert(parse("^alla*") === Right(First(Prefix("alla"))))
    assert(parse("\"most merc\"* OR mercy") ===
      Right(Or(PhrasePrefix(Seq("most"), "merc"), Term("mercy"))))
    // FTS5 rejects DETACHED operators: a star not glued to its
    // token/phrase, a caret not glued to what it anchors (ADVICE r16)
    Seq("alpha *", "\"a b\" *", "^ alpha", "(a b)*").foreach { q =>
      val r = parse(q)
      assert(r.isLeft && r.swap.exists(_.contains("syntax error")),
        s"'$q' should be an FTS5 syntax error, got $r")
    }
    // an over-Int NEAR window is the pinned error string, never a throw
    val big = parse("NEAR(a b, 99999999999)")
    assert(big.isLeft && big.swap.exists(_.contains("syntax error")))
  }

  test("malformed syntax surfaces FTS5-style error strings, never throws") {
    // unknown column — the reference's FTS table indexes only `content`
    assert(parse("surah:5") === Left("no such column: surah"))
    // unbalanced / dangling / unterminated — all syntax errors
    Seq("(alpha", "alpha)", "alpha OR", "NOT alpha", "\"unterminated",
      "NEAR(alpha)", "NEAR(alpha beta, x)", "alpha AND", "", "mercy & x")
      .foreach { q =>
        val r = parse(q)
        assert(r.isLeft, s"'$q' should fail to parse, got $r")
        assert(r.swap.exists(e =>
          e.contains("syntax error") || e.contains("no such column")),
          s"'$q' error not FTS5-shaped: $r")
      }
  }

  // ---- engine semantics over a hand-countable corpus ----

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
    assert(keys("quick (dog OR cat)") === Seq("1:1", "1:2"))
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
    // quick* matches the term 'quick' in 1:1, 1:2, 2:2 and 'quick'
    // only — but foxes/fox* matches fox (1:1) and foxes (1:3)
    assert(keys("fox*") === Seq("1:1", "1:3"))
    assert(keys("fox* dog") === Seq("1:1")) // 1:3 has 'dogs', not 'dog'
    assert(keys("fox* dog*") === Seq("1:1", "1:3"))
    // ^: only docs whose FIRST token matches
    assert(keys("^the") === Seq("1:1", "2:1")) // 'the quick…', 'the cat…'
    assert(keys("^\"the quick\"") === Seq("1:1"))
    assert(keys("^a") === Seq("1:2"))
  }

  test("phrase-prefix semantics: exact run then any term on the stem (r17)") {
    // 'quick d…': "quick dog" (1:2) and "quick deeds" (2:2) — NOT 1:1
    // ("quick brown") or 1:3 ("quick and")
    assert(keys("\"quick d\"*") === Seq("1:2", "2:2"))
    // longer stem narrows to the single doc
    assert(keys("\"quick de\"*") === Seq("2:2"))
    // stem matching nothing → empty, not error
    assert(keys("\"quick zz\"*") === Seq())
    // three-token form: two exact + stem
    assert(keys("\"at the bro\"*") === Seq("1:2"))
    // anchored: first token 'the', second starts 'qui' — 1:1 only
    assert(keys("^\"the qui\"*") === Seq("1:1"))
    assert(keys("^fox*") === Seq("1:3")) // 'foxes are…' anchors; 1:1 has fox mid-doc
    // composes with set algebra
    assert(keys("\"quick d\"* NOT barks") === Seq("2:2"))
    // prefix operands inside NEAR (r17): fox/foxes via fox*, window on
    // the usual FTS5 span rule — 1:1 has fox@3 lazy@7 (span 5 ≤ n+2 at
    // n=3), 1:3 has foxes@0 lazy@6 (span 7, needs n=5)
    assert(keys("NEAR(fox* lazy, 3)") === Seq("1:1"))
    assert(keys("NEAR(fox* lazy, 5)") === Seq("1:1", "1:3"))
    // phrase-prefix operand: "quick deeds"@5-6 and far@3 in 2:2
    assert(keys("NEAR(\"quick d\"* far, 1)") === Seq("2:2"))
    assert(keys("NEAR(\"quick d\"* cat, 10)") === Seq("1:2"))
  }

  test("ranking is BM25 over positive tokens, candidates only") {
    val rows = FtsMatch.search(idx, "quick NOT dog", n = 10)
      .toOption.get.collect()
    // 2:2 has tf(quick)=2 — must outrank 1:3's single occurrence
    assert(rows.map(_.getString(0)).toSeq === Seq("2:2", "1:3"))
    assert(rows.forall(r => r.getDouble(3) > 0))
  }
}
