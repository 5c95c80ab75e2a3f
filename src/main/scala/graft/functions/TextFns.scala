package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalar text functions of the engine (SURVEY.md §2.8).
  *
  * Everything here is built from codegen'd builtin column expressions — no
  * UDFs — so the whole text pipeline stays inside whole-stage codegen.
  *
  * Portability invariant: the only hash primitives used are md5/sha2, which
  * produce identical results in DuckDB (the correctness oracle), so every
  * derived operator (minhash, simhash, fingerprints) is cross-checkable.
  */
object TextFns {

  /** Tokenizer separator class — complement of the reference's `[\w؀-ۿ]+`
    * token class (reference: mcp_server/apps/router.py:41-44; Python `\w`
    * is `[a-z0-9_]` post-lowering for our corpora, plus the Arabic block). */
  val TokenSep = "[^a-z0-9_؀-ۿ]+"

  /** F2: lowercase, split on non-word, drop empties — executed as the
    * native [[graft.plans.ClassTokens]] byte scan (bit-identical to
    * `filter(split(lower(c), TokenSep), len>0)`, which PropertySpec pins;
    * the regex form measured ~half the postings-build cost). */
  def tokens(c: Column): Column =
    graft.plans.ClassTokens(lower(c))

  /** Router variant of F2: additionally drops single-char tokens
    * (reference: router.py:43-44). */
  def routerTokens(c: Column): Column =
    filter(graft.plans.ClassTokens(lower(c)), t => length(t) > lit(1))

  def distinctTokens(c: Column): Column = array_distinct(tokens(c))

  /** Vocabulary-free SUBWORD token estimate (r13): every [[tokens]]
    * word costs `ceil(len/4)` pieces — `1 + (len−1) div 4` on the
    * integer grid. Mimics where a trained BPE actually spends tokens
    * (common short words ≈ 1 piece; long/rare words split every ~4
    * chars — the classic "~4 chars/token" English rule), with zero
    * vocabulary artifact, so it is deterministic, engine-portable
    * (DuckDB: `1 + (len(x)-1)//4`), and cheap at 100 TB (a narrow
    * per-row pass; no model file shipped to executors). Trainers
    * budget in subword tokens — this is the measure shard packing and
    * token-budget selection should run on when the recipe's budget is
    * subword-denominated. Division by 4 (a power of two) is exact in
    * doubles, so `floor` lands identically in both engines. */
  def subwordCount(c: Column): Column =
    coalesce(
      aggregate(tokens(c), lit(0L),
        (acc, w) => acc + lit(1L) +
          floor((length(w) - lit(1)) / lit(4.0)).cast(LongType)),
      lit(0L))

  /** Portable 60-bit hash: first 15 hex chars of md5, as a non-negative
    * long. DuckDB equivalent: ('0x' || substring(md5(x),1,15))::BIGINT.
    * Executed as the fused [[graft.plans.Hash60]] digest-byte scan
    * (bit-identical to `conv(substring(md5(c),1,15),16,10)`, pinned in
    * PropertySpec; the composed chain allocated a 32-char hex string +
    * a radix re-parse per hashed value — measured r18 as a material
    * slice of the minhash/simhash/fingerprint row work). */
  def hash60(c: Column): Column = graft.plans.Hash60(c)

  /** Seeded variant (for minhash families). */
  def hash60(seed: Int, c: Column): Column = hash60(concat(lit(s"$seed:"), c))

  /** 31-bit variant, safe for exact double arithmetic. */
  def hash31(c: Column): Column = hash60(c) % lit(2147483647L)

  /** Scala-side twin of [[hash31]] for driver-side planning (query-vector
    * encoding, LSH hyperplane signs). Bit-identical to the column version. */
  def hash31Local(s: String): Long =
    hash31Bytes(java.security.MessageDigest.getInstance("MD5"),
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Allocation-light core of [[hash31Local]] for PER-ROW expression
    * hot paths ([[graft.plans.EmbedSlots]]): the same md5-based 60-bit
    * value read straight from the digest bytes — the first 15 hex chars
    * are bytes 0–6 plus the HIGH nibble of byte 7 — with a reusable
    * MessageDigest and no hex-string formatting (the
    * `"%02x".format` hex path costs a java.util.Formatter per byte —
    * measured as the bulk of the per-row slots build). Equality with
    * the string form is pinned in EmbedSlotsSpec. */
  def hash31Bytes(md: java.security.MessageDigest, utf8: Array[Byte]): Long = {
    val d = md.digest(utf8) // digest() resets md for the next call
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    ((h << 4) | ((d(7) & 0xffL) >>> 4)) % 2147483647L
  }

  /** F18: record checksum — sha256 over U+241F-joined fields
    * (reference: sunnah_scraper/models.py:72-81). */
  def checksum(cols: Column*): Column = sha2(concat_ws("␟", cols: _*), 256)

  /** F19: HTML tag strip (reference: quran_mcp/loader.py:13-21). */
  def htmlStrip(c: Column): Column = regexp_replace(c, "<[^>]+>", " ")

  /** DOM-aware visible-text extraction (r17) — the crawl-cleanup step
    * the regex strip above cannot do: parses real HTML through
    * [[graft.sources.HtmlDom]] and drops script/style bodies, comments,
    * and boilerplate containers (nav/header/footer/aside/…) that a
    * `<[^>]+>` strip would leak into training text. §2.11-licensed UDF
    * (a DOM walk has no builtin-expression form); per-row and
    * stateless, so it rides any scan without a shuffle. */
  val htmlVisibleText = udf((html: String) =>
    if (html == null) null
    else graft.sources.HtmlDom.visibleText(html).getOrElse(""))

  /** F21: whitespace normalization (reference: sunnah_scraper/parser.py:35-41). */
  def normWhitespace(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** F1: narrator canonicalization, mirroring the reference exactly
    * (mcp_server/apps/normalization.py:8-26): strip honorific
    * parentheticals only (en+ar), reporting verbs with optional trailing
    * colon, `:`/`،` punctuation, collapse whitespace, trim the
    * space/dash/bidi-mark set, NULL on empty. Arabic text passes through
    * untouched (round-3 verdict fix). */
  def canonicalize(c: Column): Column = {
    val noHon = regexp_replace(c,
      "(?i)\\((?:may|may allah be pleased|رضي الله عن(?:ه|ها|هم))[^)]*\\)", "")
    val noVerbs = regexp_replace(noHon, "(?i)\\b(reported|narrated|said|stated)\\b:?", "")
    val noPunct = regexp_replace(noVerbs, "[:،]", "")
    val collapsed = regexp_replace(noPunct, "\\s+", " ")
    nullif(trim(collapsed, " -‏‎﻿"), lit(""))
  }

  /** T6: snippet/preview truncation (reference: mcp_server/tools.py:154). */
  def snippet(c: Column, n: Int): Column = substring(c, 1, n)

  /** F20: trailing Arabic-Indic/ASCII digit + whitespace strip, then trim
    * (reference: quran_scraper/scrape_ibn_kathir.py:20,82-85 — footnote
    * numbers left at the end of scraped tafsir paragraphs). */
  def stripDigitSuffix(c: Column): Column =
    trim(regexp_replace(c, "[\\s٠-٩۰-۹0-9]+$", ""))

  /** n-token shingles joined by '_' (dedup primitives). Built from n
    * shifted slices zipped elementwise — O(n·len) per row. (The naive
    * per-position slice form re-evaluates its argument expression per
    * shingle once Catalyst collapses projections into the lambda —
    * O(len²·tokenize) per row; round-4 bench fix.) */
  def shingles(toks: Column, n: Int): Column = {
    val cnt = size(toks) - lit(n - 1)
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), greatest(cnt, lit(0))))
    val joined = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit("_"), y)))
    when(size(toks) >= n, joined).otherwise(array())
  }

  /** Rolling polynomial fingerprint over the token stream, mod 1e9+7.
    * acc' = (acc*31 + hash31(token)) % M — order-sensitive document
    * fingerprint; portable (DuckDB: list_reduce with a prepended 0 seed
    * over the same recurrence). */
  val FingerprintMod = 1000000007L
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => (acc * lit(31L) + hash31(t)) % lit(FingerprintMod))
}
