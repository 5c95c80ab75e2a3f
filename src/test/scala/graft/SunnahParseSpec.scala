package graft

import graft.sources.HtmlDom
import graft.operators.SunnahParse

/** HTML→record extraction (r17 — parser.py parity): DOM leniency rules
  * the fixture corpus depends on, the python-whitespace normalization
  * contract, and a real-fixture pin including the reference's checksum
  * formula. The registered parse_* rows oracle the full extraction
  * against the reference's own shipped JSONL (1896/1896 hash-equal). */
class SunnahParseSpec extends SparkSpec {

  test("entity decoding: named subset, numeric, passthrough") {
    assert(HtmlDom.unescape("a &amp; b &#39;c&#39; &#187; &quot;d&quot; &times;2") ===
      "a & b 'c' » \"d\" ×2")
    assert(HtmlDom.unescape("5 &lt; 6 &gt; 4") === "5 < 6 > 4")
    assert(HtmlDom.unescape("&bogus; &#x61;&#X62;") === "&bogus; ab")
    assert(HtmlDom.unescape("no entities") === "no entities")
  }

  test("normalize uses PYTHON's whitespace class (NBSP collapses)") {
    // &nbsp;:&nbsp;value — the reference-table cell shape; java trim
    // would keep the   and break value extraction
    assert(HtmlDom.normalize(" : Book 1, Hadith 1") ===
      Some(": Book 1, Hadith 1"))
    assert(HtmlDom.normalize("  a  b c d  ") === Some("a b c d"))
    assert(HtmlDom.normalize("  ") === None)
    assert(HtmlDom.normalize("") === None)
  }

  test("adjacent text merges across an IGNORED tag, splits at real nodes") {
    // stray </a> with no open anchor: HTML5 keeps appending to the same
    // text node, so selectolax-style text() has NO separator there (the
    // 33-record text_ar divergence this rule fixed)
    val d1 = HtmlDom.parse("<div>left}</a>right</div>")
    assert(d1.byClass _ != null)
    assert(d1.first(_.tag == "div").get.text === Some("left}right"))
    // a real element between chunks keeps them separate → separator
    val d2 = HtmlDom.parse("<div>left<br>right</div>")
    assert(d2.first(_.tag == "div").get.text === Some("left right"))
    // a matched close tag also separates: <b>x</b>. → "x ."
    val d3 = HtmlDom.parse("<div><b>[Al-Bukhari]</b>.</div>")
    assert(d3.first(_.tag == "div").get.text === Some("[Al-Bukhari] ."))
    // comments are NODES in the tree — text around them stays split
    val d4 = HtmlDom.parse("<div>left<!-- c -->right</div>")
    assert(d4.first(_.tag == "div").get.text === Some("left right"))
  }

  test("lenient structure: unquoted attrs, unclosed p, script exclusion") {
    val d = HtmlDom.parse(
      "<div class=chapter id=h1>a<p>b<p>c<div class=next>d</div></div>" +
        "<script>var x = '<div>not text</div>';</script>")
    val ch = d.first(_.hasClass("chapter")).get
    assert(ch.attr("id") === Some("h1"))
    // the unclosed <p>s must NOT swallow the sibling div
    val next = d.first(_.hasClass("next")).get
    assert(next.parent.hasClass("chapter"))
    assert(ch.text === Some("a b c d"))
    // script body is raw text and excluded from extraction
    assert(d.text === Some("a b c d"))
  }

  test("urlJoin handles absolute paths, absolute urls, relatives") {
    assert(SunnahParse.urlJoin("https://sunnah.com/riyadussalihin", "/riyadussalihin/5") ===
      "https://sunnah.com/riyadussalihin/5")
    assert(SunnahParse.urlJoin("https://sunnah.com/x", "https://other.test/y") ===
      "https://other.test/y")
    assert(SunnahParse.urlJoin("https://sunnah.com/x/", "y") ===
      "https://sunnah.com/x/y")
  }

  test("real fixture page parses to the shipped first record + checksum") {
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/html/riyadussalihin/1.html")),
      java.nio.charset.StandardCharsets.UTF_8)
    val p = SunnahParse.parseBookPage(html, "riyadussalihin",
      Queries.SunnahName, "1", "https://sunnah.com/riyadussalihin/1")
    assert(p.records.length === 47)
    assert(p.quarantined.isEmpty)
    assert(p.header.book_title_en === "The Book of Good Manners")
    assert(p.header.book_title_ar === Some("كتاب الأدب"))
    assert(p.header.book_number === Some("1"))
    val r = p.records.head
    assert(r.hadith_id_site === "h1706760")
    assert(r.chapter_id === Some("C84.00"))
    assert(r.chapter_title_en === Some("Exaltation of Modesty"))
    assert(r.hadith_num_global === Some("Riyad as-Salihin 680"))
    assert(r.hadith_num_in_book === Some("Book 1, Hadith 1"))
    assert(r.narrator === Some("Ibn 'Umar (May Allah be pleased with them) reported:"))
    assert(r.references === Seq(
      SunnahParse.RefRow("Reference", "Riyad as-Salihin 680"),
      SunnahParse.RefRow("In-book reference", "Book 1, Hadith 1")))
    assert(r.source_url === "https://sunnah.com/riyadussalihin/1#h1706760")
    // the reference's computed checksum (models.py:76-83) over the
    // extracted texts must equal the SHIPPED value for this record
    val payload = Seq("riyadussalihin", "1", "h1706760",
      r.text_en + "␟" + r.text_ar).mkString("␟")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sha ===
      "5890d21b341fc0c1b2052b513e4efd6f5a1d0c436695235dbeb23b8e1bd1a1ce")
  }

  test("quarantine surfaces what the reference silently skips (P7)") {
    val p = SunnahParse.parseBookPage(SunnahEdgeBattery.BookHtml, "test",
      "Test Collection", "tb", "https://sunnah.com/test/tb")
    assert(p.records.map(_.hadith_id_site) === Seq("h100", "x7", "h400"))
    assert(p.quarantined.map(q => (q.container_index, q.hadith_id_site, q.reason)) ===
      Seq((2, None, "no_stable_id"), (3, Some("h300"), "missing_text")))
    // grading rows: gradeby/strong scholar fallbacks, optional note
    assert(p.records.head.grading === Seq(
      SunnahParse.GradingRow("Al-Albani", Some("Sahih"), None),
      SunnahParse.GradingRow("Grader Two", Some("Hasan"), Some("chain note"))))
    // the chapter prev-sibling anchor walk: chapter 2 has no anchor and
    // adopts the C1.00 one (parser.py:96-103's documented behavior)
    assert(p.records.last.chapter_id === Some("C1.00"))
    assert(p.records.last.chapter_title_en === Some("Second"))
  }

  test("visibleText drops chrome/script/comments, keeps main content (r17)") {
    val page =
      """<html><head><title>t</title><script>var x = '<p>junk</p>';</script>
        |<style>p{}</style></head><body><header>Site Header</header>
        |<nav><a href=/h>Home</a></nav><div id=m><p>real &amp; main</p>
        |<p>second para</p></div><!-- c --><aside>Related</aside>
        |<noscript>enable js</noscript><form><button>Go</button></form>
        |<footer>&copy; 2026</footer></body></html>""".stripMargin
    assert(HtmlDom.visibleText(page) === Some("real & main second para"))
    // nothing visible → None, not Some("")
    assert(HtmlDom.visibleText("<body><nav>x</nav></body>") === None)
    // no body tag: falls back to the whole fragment
    assert(HtmlDom.visibleText("<div>frag</div>") === Some("frag"))
  }

  test("collection index: dedupe by book id, skip deep/foreign/empty links") {
    val (name, entries) = SunnahParse.parseCollectionIndex(
      SunnahEdgeBattery.IndexHtml, "test", "https://sunnah.com/test")
    assert(name === Some("مجموعة Test Collection"))
    assert(entries.map(e => (e.book_id, e.book_title_en)) ===
      Seq(("1", "Book One"), ("2", "Book Two"), ("4", "Book Four")))
    assert(entries.head.source_url === "https://sunnah.com/test/1")
  }
}
