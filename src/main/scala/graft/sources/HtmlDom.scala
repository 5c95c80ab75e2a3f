package graft.sources

import scala.collection.mutable.ArrayBuffer

/** A small, lenient HTML parser + node API — just enough DOM for the
  * sunnah.com record extraction ([[graft.operators.SunnahParse]], the
  * Spark twin of the reference's selectolax-based
  * `sunnah_scraper/parser.py`). Zero dependencies by design: the build
  * doctrine allows no libraries beyond Spark, and the extraction needs
  * only class/tag/attr selection, sibling walks, and text assembly.
  *
  * Leniency rules (the fixture pages use unquoted attributes, unclosed
  * `<p>`, and stray `</b>`):
  *   - void elements (`br`, `img`, `meta`, …) never open a scope;
  *   - an end tag pops the open stack through the NEAREST matching
  *     start tag, or is ignored when none is open (stray `</b>`);
  *   - `<p>` auto-closes before any block-level start tag, `li`/`tr`/
  *     `td`/`th`/`option` auto-close their own kind (HTML5-ish implied
  *     end tags — enough to keep sibling structure correct for the
  *     `.AllHadith` walk, which is what the extraction depends on);
  *   - `script`/`style`/`textarea` bodies are raw text (skipped by
  *     [[HElem.text]]);
  *   - character references decode in text and attribute values
  *     (named subset + `&#d;`/`&#xh;` — the fixture census is nbsp,
  *     #39, #187, quot, times).
  *
  * Text assembly matches what the reference observes through
  * `selectolax Node.text(separator=" ", strip=True)` followed by its
  * `normalize_text` (`" ".join(value.split())`): text nodes joined
  * with single spaces and whitespace collapsed — where "whitespace" is
  * PYTHON's `str.split()` class, which unlike Java's includes
  * U+00A0/U+2007/U+202F/U+0085 (load-bearing: reference-table cells
  * like `&nbsp;:&nbsp;Book 1, Hadith 1` must normalize exactly as the
  * reference's Python does). */
object HtmlDom {

  sealed trait HNode {
    var parent: HElem = _
    var index: Int = -1
  }

  final class HText(val data: String) extends HNode

  final class HElem(val tag: String, val attrs: Map[String, String])
      extends HNode {
    val children = new ArrayBuffer[HNode]()

    def attr(name: String): Option[String] = attrs.get(name)

    def hasClass(c: String): Boolean =
      attrs.get("class").exists(_.split("\\s+").contains(c))

    def classTokens: Set[String] =
      attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)

    /** Element children in order. */
    def elems: Seq[HElem] = children.collect { case e: HElem => e }.toSeq

    /** All descendant elements, document order, self excluded (CSS
      * descendant-combinator semantics, like `container.css(sel)`). */
    def descendants: Iterator[HElem] = children.iterator.flatMap {
      case e: HElem => Iterator.single(e) ++ e.descendants
      case _ => Iterator.empty
    }

    def first(pred: HElem => Boolean): Option[HElem] =
      descendants.find(pred)

    def all(pred: HElem => Boolean): Seq[HElem] =
      descendants.filter(pred).toSeq

    /** First descendant with class `c` (`.c`). */
    def byClass(c: String): Option[HElem] = first(_.hasClass(c))

    /** Previous siblings, nearest first (selectolax `node.prev` walk). */
    def prevSiblings: Iterator[HNode] =
      if (parent == null || index <= 0) Iterator.empty
      else (index - 1 to 0 by -1).iterator.map(parent.children(_))

    /** Subtree text, selectolax `text(separator=" ", strip=True)` +
      * python-normalized: stripped text chunks joined with " ",
      * whitespace (python class) collapsed. `script`/`style` bodies
      * excluded. Empty → None (the reference's `text_content`). */
    def text: Option[String] = {
      val sb = new StringBuilder
      def walk(e: HElem): Unit =
        if (!RawTextTags.contains(e.tag)) e.children.foreach {
          case t: HText => sb.append(t.data).append(' ')
          case c: HElem => walk(c)
        }
      walk(this)
      normalize(sb.toString())
    }
  }

  /** Python `str.split()` whitespace — Java's isWhitespace PLUS the
    * non-breaking members Python treats as space. */
  def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00a0' || c == '\u0085' ||
      c == '\u2007' || c == '\u202f'

  /** The reference's `normalize_text` (parser.py:34-40):
    * `" ".join(value.split())`, None when blank. */
  def normalize(s: String): Option[String] = {
    if (s == null) return None
    val parts = new ArrayBuffer[String]()
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isPySpace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isPySpace(s.charAt(i))) i += 1
      if (i > start) parts += s.substring(start, i)
    }
    if (parts.isEmpty) None else Some(parts.mkString(" "))
  }

  /** Python `str.strip()` (python whitespace class). */
  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style", "textarea")
  /** Start tags that imply `</p>` first (HTML5 §8.2.5 "in body"). */
  private val ClosesP = Set("address", "article", "aside", "blockquote",
    "div", "dl", "fieldset", "footer", "form", "h1", "h2", "h3", "h4",
    "h5", "h6", "header", "hr", "main", "nav", "ol", "p", "pre",
    "section", "table", "ul")

  private val Named = Map(
    "quot" -> "\"", "amp" -> "&", "apos" -> "'", "lt" -> "<", "gt" -> ">",
    "nbsp" -> "\u00a0", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "middot" -> "·", "bull" -> "•",
    "sect" -> "§", "plusmn" -> "±", "pound" -> "£",
    "euro" -> "€", "yen" -> "¥", "cent" -> "¢",
    "shy" -> "\u00ad")

  /** Decode HTML character references (named subset + numeric). An
    * unrecognized `&…` sequence passes through literally, like
    * browsers. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val body =
          if (semi > i && semi - i <= 12) Some(s.substring(i + 1, semi))
          else None
        body match {
          case Some(b) if b.startsWith("#x") || b.startsWith("#X") =>
            try { sb.appendAll(Character.toChars(Integer.parseInt(b.drop(2), 16))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          case Some(b) if b.startsWith("#") && b.drop(1).nonEmpty &&
              b.drop(1).forall(_.isDigit) =>
            try { sb.appendAll(Character.toChars(b.drop(1).toInt)); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          case Some(b) if Named.contains(b) =>
            sb.append(Named(b)); i = semi + 1
          case _ => sb.append(c); i += 1
        }
      }
    }
    sb.toString()
  }

  /** Parse an HTML document (or fragment) into a `#root` element. */
  def parse(html: String): HElem = {
    val root = new HElem("#root", Map.empty)
    val lower = html.toLowerCase // for raw-text close-tag scans
    val stack = new ArrayBuffer[HElem]()
    stack += root

    def top = stack.last
    def appendNode(n: HNode): Unit = {
      n.parent = top
      n.index = top.children.length
      top.children += n
    }
    // HTML5 tree construction appends characters to the CURRENT text
    // node when the parent's last child is already text — adjacent
    // chunks split only by an IGNORED tag (a stray `</a>` with no open
    // anchor, say) end up as ONE text node, and selectolax's
    // separator-joined text() therefore puts no separator there.
    // Comments DO become nodes, so text around a comment stays split.
    def appendText(raw: String): Unit =
      if (raw.nonEmpty) top.children.lastOption match {
        case Some(t: HText) =>
          val merged = new HText(t.data + unescape(raw))
          merged.parent = top
          merged.index = top.children.length - 1
          top.children(top.children.length - 1) = merged
        case _ => appendNode(new HText(unescape(raw)))
      }
    def openElem(tag: String, attrs: Map[String, String]): HElem = {
      val e = new HElem(tag, attrs)
      appendNode(e)
      e
    }
    def closeThrough(tag: String): Unit = {
      // nearest matching open element, never popping past the root
      var k = stack.length - 1
      while (k >= 1 && stack(k).tag != tag) k -= 1
      if (k >= 1) stack.remove(k, stack.length - k)
    }
    def hasOpen(tag: String): Boolean = stack.drop(1).exists(_.tag == tag)

    val n = html.length
    var i = 0
    var textStart = 0
    def flushText(until: Int): Unit =
      if (until > textStart) appendText(html.substring(textStart, until))

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { flushText(n); i = n; textStart = n }
      else if (lt + 1 >= n) { flushText(n); i = n; textStart = n }
      else {
        val next = html.charAt(lt + 1)
        if (next == '!') {
          flushText(lt)
          if (html.startsWith("<!--", lt)) {
            val end = html.indexOf("-->", lt + 4)
            i = if (end < 0) n else end + 3
            appendNode(new HElem("#comment", Map.empty))
          } else {
            // doctype / CDATA: consumed, no node
            val end = html.indexOf('>', lt + 2)
            i = if (end < 0) n else end + 1
          }
          textStart = i
        } else if (next == '?') { // PI → bogus comment node (HTML5)
          flushText(lt)
          val end = html.indexOf('>', lt + 2)
          i = if (end < 0) n else end + 1
          appendNode(new HElem("#comment", Map.empty))
          textStart = i
        } else if (next == '/') {
          flushText(lt)
          val end = html.indexOf('>', lt + 2)
          if (end < 0) { i = n; textStart = n }
          else {
            val name = html.substring(lt + 2, end).trim.toLowerCase
            if (name.nonEmpty && hasOpen(name)) closeThrough(name)
            i = end + 1
            textStart = i
          }
        } else if (next.isLetter) {
          flushText(lt)
          // start tag: name, attributes, optional self-close
          var j = lt + 1
          while (j < n && !html.charAt(j).isWhitespace &&
            html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
          val tag = html.substring(lt + 1, j).toLowerCase
          val attrs = Map.newBuilder[String, String]
          var selfClose = false
          var done = false
          while (!done && j < n) {
            while (j < n && html.charAt(j).isWhitespace) j += 1
            if (j >= n) done = true
            else html.charAt(j) match {
              case '>' => j += 1; done = true
              case '/' =>
                j += 1
                if (j < n && html.charAt(j) == '>') { j += 1; selfClose = true; done = true }
              case _ =>
                val as = j
                while (j < n && !html.charAt(j).isWhitespace &&
                  html.charAt(j) != '=' && html.charAt(j) != '>' &&
                  html.charAt(j) != '/') j += 1
                val aname = html.substring(as, j).toLowerCase
                while (j < n && html.charAt(j).isWhitespace) j += 1
                var avalue = ""
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && html.charAt(j).isWhitespace) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j)
                    val e = html.indexOf(q, j + 1)
                    if (e < 0) { avalue = html.substring(j + 1); j = n }
                    else { avalue = html.substring(j + 1, e); j = e + 1 }
                  } else {
                    val vs = j
                    while (j < n && !html.charAt(j).isWhitespace &&
                      html.charAt(j) != '>') j += 1
                    avalue = html.substring(vs, j)
                    // an unquoted value may end `.../>`; the '/' belongs
                    // to the value per HTML5, so leave it
                  }
                }
                if (aname.nonEmpty) attrs += (aname -> unescape(avalue))
            }
          }
          // implied end tags
          if (ClosesP.contains(tag) && hasOpen("p")) closeThrough("p")
          tag match {
            case "li" if top.tag == "li" => closeThrough("li")
            case "tr" if top.tag == "td" || top.tag == "th" =>
              closeThrough(top.tag)
              if (top.tag == "tr") closeThrough("tr")
            case "tr" if top.tag == "tr" => closeThrough("tr")
            case "td" | "th" if top.tag == "td" || top.tag == "th" =>
              closeThrough(top.tag)
            case "option" if top.tag == "option" => closeThrough("option")
            case _ =>
          }
          val e = openElem(tag, attrs.result())
          if (RawTextTags.contains(tag) && !selfClose) {
            // raw text until the matching close tag
            val closeRe = s"</$tag"
            val idx = lower.indexOf(closeRe, j)
            val end = if (idx < 0) n else idx
            if (end > j) {
              val t = new HText(html.substring(j, end))
              t.parent = e; t.index = 0
              e.children += t
            }
            val gt = html.indexOf('>', end)
            j = if (idx < 0 || gt < 0) n else gt + 1
          } else if (!selfClose && !VoidTags.contains(tag)) {
            stack += e
          }
          i = j
          textStart = i
        } else {
          // '<' followed by junk: literal text, keep scanning
          i = lt + 1
        }
      }
    }
    root
  }

  /** The `<body>` element if present, else the root — the reference's
    * `tree.body or tree` (parser.py:252). */
  def body(root: HElem): HElem =
    (Iterator.single(root) ++ root.descendants).find(_.tag == "body")
      .getOrElse(root)

  /** Non-content containers a crawl→training-data pipeline strips
    * alongside script/style: site chrome and interactive furniture. */
  val BoilerplateTags: Set[String] = Set("nav", "header", "footer",
    "aside", "noscript", "template", "form", "button", "iframe")

  /** Visible "main text" of a page: body text with [[BoilerplateTags]]
    * subtrees excluded (script/style are excluded by [[HElem.text]]'s
    * raw-text rule already) — the HTML→plain-text step of a crawl
    * cleanup pipeline, python-normalized like every other extraction
    * here. None when nothing visible remains. */
  def visibleText(html: String): Option[String] = {
    val sb = new StringBuilder
    def walk(e: HElem): Unit =
      if (!RawTextTags.contains(e.tag) && !BoilerplateTags.contains(e.tag))
        e.children.foreach {
          case t: HText => sb.append(t.data).append(' ')
          case c: HElem => walk(c)
        }
    walk(body(parse(html)))
    normalize(sb.toString())
  }
}
