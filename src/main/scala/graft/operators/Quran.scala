package graft.operators

import graft.functions.{Scoring, TextFns}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The second engine: tafsir search (reference: quran_mcp/ — loader.py,
  * search.py:178-318). Mirrors the lifecycle: corpus load (S2) →
  * lexical probe (BM25 over text_plain) → semantic probe (cosine over the
  * imported npz vectors) → fusion by verse_key with `greatest` on the
  * vector score (J3) → weighted sum rounded 6 (F15) → deterministic
  * text-block dedupe (T4) → top-n envelope.
  */
object Quran {

  val tafsirSchema: StructType = StructType(Seq(
    StructField("surah", IntegerType),
    StructField("ayah", IntegerType),
    StructField("verse_key", StringType),
    StructField("resource_id", IntegerType),
    StructField("resource_name", StringType),
    StructField("language_id", IntegerType),
    StructField("slug", StringType),
    StructField("translated_name", StructType(Seq(
      StructField("name", StringType), StructField("language_name", StringType)))),
    StructField("text_plain", StringType),
    StructField("text_arabic_simple", StringType),
    StructField("text_arabic_uthmani", StringType),
    StructField("fetched_at", DoubleType)))

  /** S2: corpus scan with text_plain fallback (loader.py:64-108 strips
    * HTML when text_plain is absent — all bundled rows carry it, the
    * fallback covers re-scrapes) and source-file manifest column. The
    * fallback also strips trailing footnote digits (F20,
    * scrape_ibn_kathir.py:20,82-85 applies it to scraped Arabic text). */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(tafsirSchema).json(s"$dir/surah_*.jsonl")
      .withColumn("text_plain",
        coalesce(col("text_plain"), TextFns.stripDigitSuffix(
          TextFns.normWhitespace(TextFns.htmlStrip(col("text_arabic_simple"))))))
      .withColumn("src_file", regexp_extract(input_file_name(), "([^/]+)$", 1))

  /** A3/A4: index status (search.py:94-108). */
  def indexStatus(corpus: DataFrame): DataFrame =
    corpus.agg(count("*").as("entries"), countDistinct("surah").as("surahs"))

  /** J5: point lookup by verse key (server.py:77-107) — a broadcast-hash
    * probe; with verse_key-bucketed storage this is a single-partition read. */
  def getVerse(corpus: DataFrame, verseKey: String): DataFrame =
    corpus.where(col("verse_key") === verseKey)

  /** F16 (quran variant): mode → (w_vector, w_fts); both-zero → vector=1;
    * semantic failure degrades to FTS (search.py:193-215). */
  def resolveWeights(mode: String, semanticOk: Boolean): (Double, Double) = {
    val (wv, wf) = mode match {
      case "semantic" => (1.0, 0.0)
      case "fts" => (0.0, 1.0)
      case _ => (0.6, 0.4)
    }
    val (wv2, wf2) = if (!semanticOk) (0.0, if (wf == 0.0) 1.0 else wf) else (wv, wf)
    if (wv2 == 0.0 && wf2 == 0.0) (1.0, 0.0) else (wv2, wf2)
  }

  /** The resident tafsir index a serving session holds: corpus keyed by a
    * dense numeric id, its postings/dictionary/corpus-stats, and the
    * optional vector cache. Build once (cache + materialize via
    * [[graft.Graft.openQuran]]), then every [[searchWith]] call is a plan
    * over resident frames — no per-query index rebuild. */
  final case class Index(docs: DataFrame, postings: DataFrame,
                         dict: DataFrame, stats: DataFrame,
                         emb: Option[DataFrame],
                         embQ: Option[DataFrame] = None,
                         resident: Boolean = false,
                         maxResidentVocab: Long = HadithSearch.MaxResidentVocab) {
    /** Driver-resident dictionary (term → df) + corpus stats — bounded
      * by the tafsir VOCABULARY, the in-process FTS5-dictionary analog
      * (see HadithSearch.Index.dictLocal; like there, only MATERIALIZED
      * serving indexes take this path — `resident`). Exact probes only,
      * so a plain map suffices. The bound is ENFORCED (one cheap count
      * over the cached dictionary, once): None keeps [[searchWith]]'s
      * lexical leg on the distributed dictionary join — the scale path. */
    lazy val dictLocal: Option[Map[String, Long]] =
      if (dict.count() > maxResidentVocab) None
      else Some(dict.collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap)
    lazy val statsLocal: (Long, Long) = {
      val r = stats.head()
      (r.getAs[Long]("n_docs"),
        if (r.isNullAt(r.fieldIndex("sum_dl"))) 0L else r.getAs[Long]("sum_dl"))
    }
    /** Tokenized-docs layer shared by every POSITIONAL MATCH leg
      * (r19, guide §2.4): (doc_id, text_plain, t) with `t` the token
      * array, cached on first use. phrase/NEAR/anchor verification
      * previously re-tokenized its pruned candidate subset PER LEG —
      * the 11-leg battery re-ran the corpus tokenize ~7× (10-27 s task
      * CPU per leg at sf0.1); every leg now reads one cached array
      * column and keeps its row-local prune. text_plain rides along so
      * [[graft.operators.FtsMatch]]'s substring prune stays row-local
      * over this same frame. Lazy: only positional MATCH paths pay the
      * fill (single-term/bm25 searches never touch it); [[warmed]]
      * fills it for the battery so concurrent legs can't stampede the
      * lazy cache. */
    lazy val docsTokens: DataFrame = docs
      .select(col("doc_id"), col("text_plain"),
        TextFns.tokens(col("text_plain")).as("t"))
      .cache()
    /** Eager wave materialization for ONE-SHOT (cold) multi-probe
      * plans: fill every cached layer once, in dependency order, and
      * return the index otherwise UNCHANGED (no re-root, no narrowing,
      * non-resident — the cold plans keep their exact shape and the
      * distributed query branches; re-rooted layers under AQE hit
      * InMemoryRelation canonicalization on plan reuse, which is why
      * this is not [[materialize]]). Without the warm-up, a plan whose
      * probe legs run as concurrent jobs (AQE stage jobs, await2 legs)
      * stampedes the not-yet-materialized caches: every leg recomputes
      * the full corpus scan/tokenize/postings build in parallel
      * (measured r18: the 11-leg MATCH battery re-read and re-tokenized
      * the corpus ~12× — guide §2.4, compute shared layers once). */
    def warmed(): Index = {
      Postings.awaitAll(Seq(() => docs.count(): Unit) ++
        emb.map(e => () => e.count(): Unit))
      Postings.awaitAll(Seq(() => postings.count(): Unit,
        () => docsTokens.count(): Unit) ++
        embQ.map(e => () => e.count(): Unit))
      Postings.awaitAll(Seq(() => dict.count(): Unit, () => stats.count(): Unit))
      this
    }

    /** Force every cached layer (the warm-open step), in dependency
      * waves of concurrent jobs: corpus + raw vectors first, then the
      * postings/quantized layers over them, then dictionary/stats. */
    def materialize(): Index = {
      var nDocs = 0L
      Postings.awaitAll(Seq(() => { nDocs = docs.count() }: Unit) ++
        emb.map(e => () => e.count(): Unit))
      Postings.awaitAll(Seq(() => postings.count(): Unit) ++
        embQ.map(e => () => e.count(): Unit))
      Postings.awaitAll(Seq(() => dict.count(): Unit, () => stats.count(): Unit))
      // re-root every layer at its materialized cache entry: per-query
      // plans compose over InMemoryRelation leaves, not derivation trees
      // (see HadithSearch.Index.materialize) — and read the big layers
      // through a DATA-matched coalesce view (serve width; see the
      // HadithSearch twin for why this lives here, not at build)
      import org.apache.spark.sql.graftshim.ColumnShim.reroot
      val sess = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      val w = Postings.serveWidth(nDocs, sess)
      def narrow(df: DataFrame) = reroot(df).coalesce(w)
      Index(narrow(docs), narrow(postings), reroot(dict), reroot(stats),
        emb.map(reroot), embQ.map(narrow), resident = true,
        maxResidentVocab = maxResidentVocab)
    }
  }

  /** Derive the index frames from a corpus scan. `cache=true` marks every
    * layer for caching (lazy — nothing materializes until first use).
    * embQ pre-quantizes every corpus vector and its norm ONCE — the per-
    * query vector leg is then one dot product + division per row instead
    * of re-quantizing 384 components per row per query. */
  def buildIndex(corpus: DataFrame, emb: Option[DataFrame],
                 cache: Boolean = true): Index = {
    def c(df: DataFrame) = if (cache) df.cache() else df
    // full corpus + the dense numeric key; search plans prune to the
    // columns they touch, point lookups keep every corpus field
    val docs = c(corpus.withColumn("doc_id",
      (col("surah").cast("long") * 1000) + col("ayah")))
    // Build-time invariant behind the dense key: [[searchWith]]'s fts leg
    // RECONSTRUCTS verse_key as s"${id/1000}:${id%1000}", so every corpus
    // row must satisfy verse_key == s"$surah:$ayah" with ayah in [0,999]
    // — a row violating it (padding, whitespace, numbering drift in
    // re-scraped data) would silently drop its lexical candidate at the
    // backfill join. Checked over the CACHED docs layer (the check's job
    // is what first materializes the cache every later layer reads — the
    // scan is paid once, not added), so the failure is loud at build,
    // not silent at query time.
    // null-SAFE comparison (<=>): a row with NULL verse_key/surah/ayah
    // breaks the invariant too, and a plain =!= evaluates to NULL there
    // — the WHERE would drop exactly the rows the check exists to catch
    val drift = docs.where(
      !(col("verse_key") <=> concat(col("surah").cast("string"), lit(":"),
        col("ayah").cast("string"))) ||
      col("surah").isNull || col("ayah").isNull ||
      col("ayah") < 0 || col("ayah") > 999 || col("surah") <= 0)
      .select("verse_key", "surah", "ayah").limit(3).collect()
    require(drift.isEmpty,
      s"corpus rows break the verse_key == surah:ayah invariant the dense " +
        s"key relies on (first: ${drift.toSeq.mkString(", ")})")
    // term-clustered so cached term probes seek (batch pruning), the way
    // the persisted layout's term buckets do on disk; layers build at
    // the SESSION's width — serve narrowing happens in materialize()
    indexFromLayers(docs,
      c(Postings.clusterByTerm(Postings.build(docs, "doc_id", "text_plain"))),
      emb, cache)
  }

  /** Assemble an Index from its persisted/base layers — the one place the
    * dictionary/stats/embQ derivations live, shared by the in-memory
    * build and the parquet open path. */
  def indexFromLayers(docs: DataFrame, postings: DataFrame,
                      emb: Option[DataFrame], cache: Boolean = true): Index = {
    def c(df: DataFrame) = if (cache) df.cache() else df
    // zero-norm corpus vectors are dropped HERE, like the hadith
    // embedSlots layer (Hybrid.embedSlots' n > 0 filter): a zero vector
    // has no direction, the reference's NumPy sims for it are NaN and
    // its sim>0 filter discards them, and under ANSI mode the cosine
    // division would THROW for every query instead
    val embQ = emb.map(e => c(e.select(col("verse_key"),
      graft.functions.VecFns.quantize(col("embedding")).as("qv"))
      .withColumn("nq", graft.functions.VecFns.norm2(col("qv")))
      .where(col("nq") > 0)))
    // cap the docs layer at the session's width (it inherits one split
    // per source JSONL file otherwise); the DATA-matched serve
    // narrowing happens in materialize(). docs arrives cached by every
    // caller — coalesce on top of the cache, no second copy.
    val width = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val docsSized = if (cache) docs.coalesce(width) else docs
    Index(docsSized, postings, c(Postings.dictionary(postings)),
      c(Postings.corpusStats(postings)), emb, embQ)
  }

  /** Full search lifecycle, cold form: builds the index inline (correct,
    * but measures index build — serving sessions use [[buildIndex]] once
    * + [[searchWith]]). `queryVec` carries the encoded query when a
    * real encoder output is available (the reference encodes in-process;
    * our zero-egress build accepts precomputed vectors — its absence IS
    * the reference's own degraded mode, search.py:212-215). */
  def search(corpus: DataFrame, emb: Option[DataFrame], query: String,
             queryVec: Option[Array[Float]], n: Int = 5,
             mode: String = "hybrid"): DataFrame =
    // NOT warmed (r18, measured): the two await2 legs touch mostly
    // DIFFERENT layers (postings vs embQ), so their stampede is mild and
    // the eager fill jobs cost more than they save (same-window A/B
    // +0.2 s on both single-search rows). warmed() pays only for
    // many-leg plans — the 11-leg MATCH battery keeps it.
    searchWith(buildIndex(corpus, emb), query, queryVec, n, mode)

  /** Search over a resident [[Index]] — the warm serving path. EAGER:
    * the probe legs run at call time and the returned frame freezes the
    * candidate set (see HadithSearch.searchWith's contract note). */
  def searchWith(idx: Index, query: String, queryVec: Option[Array[Float]],
                 n: Int = 5, mode: String = "hybrid"): DataFrame = {
    val semanticOk = idx.emb.isDefined && queryVec.isDefined
    val (wv, wf) = resolveWeights(mode, semanticOk)
    val k = math.max(n * 5, 50)
    val docs = idx.docs

    // lexical leg: resident-dictionary probe (exact terms, so expansion
    // is a map lookup; unmatched terms drop out exactly as the
    // distributed dictionary join dropped them). Returns (doc_id, bm25)
    // only — verse_key derives from the dense key (surah*1000+ayah, so
    // id/1000:id%1000 IS the corpus verse_key by construction) and the
    // F9 saturation derives from bm25 in the fused frame below, so the
    // leg needs no docs join at all.
    val ftsLeg: Option[DataFrame] = {
      val raw = graft.Router.embedTokens(query).distinct
      if (raw.isEmpty || wf == 0.0) None
      else if (idx.resident && idx.dictLocal.isDefined) {
        val dl = idx.dictLocal.get
        val terms = raw.flatMap(t => dl.get(t).map(t -> _))
        if (terms.isEmpty) None // no dictionary hit ⇒ empty leg, no job
        else {
          val (nDocs, sumDl) = idx.statsLocal
          Some(Bm25.topK(Bm25.scoreResident(idx.postings, terms, nDocs, sumDl),
            math.max(n * 5, 25)))
        }
      } else // cold one-shot (dictionary/stats fold into the probe's own
        // job) or an over-bound vocabulary (distributed scale path)
        Some(Bm25.topK(Bm25.score(idx.postings, idx.dict, idx.stats, raw),
          math.max(n * 5, 25)))
    }

    val vecLeg: Option[DataFrame] =
      if (!semanticOk || wv == 0.0) None
      else {
        // query quantized on the driver with the same HALF_UP grid the
        // column quantize() applies — cosine is bit-identical to
        // VecFns.cosine over the raw vectors, but the per-row work is one
        // codegen'd dot + division over the PREBUILT embQ layer
        val qq = graft.functions.VecFns.quantizeLocal(queryVec.get)
        val qnorm = math.sqrt(qq.map(x => x * x).sum)
        // a zero-norm query vector has no direction: the reference's
        // NumPy sims come out NaN and its sim>0 filter drops every row
        // (search.py:167-169); under Spark's ANSI mode the division
        // would instead THROW, so degrade to an empty leg explicitly
        if (qnorm == 0.0) None
        else Some(idx.embQ.get
          .select(col("verse_key"),
            round(graft.functions.VecFns.dot(col("qv"), typedLit(qq.toSeq)) /
              (col("nq") * lit(qnorm)), 6).as("cos"))
          .where(col("cos") > 0) // P6 (search.py:167-169)
          // J3: max-merge duplicate verse keys (search.py:247-251)
          .groupBy("verse_key").agg(max("cos").as("vector_score"))
          .orderBy(desc("vector_score"), asc("verse_key")).limit(k))
      }

    // J3 fusion by verse_key; F15 weighted sum round 6. bm25 carried as a
    // secondary rank key so round-6 score ties resolve by lexical rank,
    // not verse order (reference keeps its candidate order on ties).
    // Two-phase serving execution (see HadithSearch.searchWith): the two
    // probe legs run as CONCURRENT jobs, each yielding a bounded (≤k)
    // candidate set; the full-outer fusion with 0.0 defaults happens
    // driver-side and re-enters the plan as a broadcast LocalRelation,
    // so backfill + dedupe + rank are one job, not a join-of-joins chain.
    // F9 saturation bm25/(1+bm25) (increasing, rank-preserving — the
    // reference's literal 1/(1+max(0,-bm25)) over positive scores is
    // constant 1.0 and collapses rank to verse order) is computed IN
    // SPARK over the fused bm25, so its round-6 grid is expression-
    // identical for fts candidates and exactly 0.0 for vec-only rows
    // (bm25 defaults to 0).
    val (ftsRows, vecRows) = Postings.await2(
      () => ftsLeg.map(_.collect()).getOrElse(Array.empty[org.apache.spark.sql.Row]),
      () => vecLeg.map(_.collect()).getOrElse(Array.empty[org.apache.spark.sql.Row]))
    val fm = ftsRows.map { r =>
      val id = r.getLong(0); s"${id / 1000}:${id % 1000}" -> r.getDouble(1)
    }.toMap
    val vm = vecRows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val spark = docs.sparkSession
    val fusedRows: Seq[org.apache.spark.sql.Row] =
      (fm.keySet ++ vm.keySet).toSeq.sorted.map { vk =>
        org.apache.spark.sql.Row(vk, fm.getOrElse(vk, 0.0), vm.getOrElse(vk, 0.0))
      }
    val fused = spark.createDataFrame(
        java.util.Arrays.asList(fusedRows: _*),
        StructType(Seq(StructField("verse_key", StringType),
          StructField("bm25", DoubleType), StructField("vector_score", DoubleType))))
      .withColumn("fts_score", round(greatest(lit(0.0), col("bm25")) /
        (lit(1.0) + greatest(lit(0.0), col("bm25"))), 6))
      .withColumn("score", Scoring.quranTotal(col("vector_score"), col("fts_score"), wv, wf))

    // backfill + T4 order-preserving text-block dedupe (search.py:262-278).
    // snippet AFTER the join: computed per candidate (~k rows), not per
    // corpus row — as a join-input projection it ran over every document
    // on every query (the single hottest stage of the warm fts leg)
    val hits = broadcast(fused).join(docs.select(col("verse_key"), col("surah"), col("ayah"),
        col("text_plain")), "verse_key")
      .withColumn("text_preview", TextFns.snippet(col("text_plain"), 200))
      .drop("text_plain")
    val block = md5(col("text_preview"))
    val w = Window.partitionBy(block)
      .orderBy(desc("score"), desc("bm25"), asc("surah"), asc("ayah"))
    hits.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
      .orderBy(desc("score"), desc("bm25"), asc("surah"), asc("ayah"))
      .limit(n)
      .select(col("verse_key"), col("surah"), col("ayah"),
        round(col("score"), 6).as("score"),
        round(col("vector_score"), 6).as("vector_score"),
        round(col("fts_score"), 6).as("fts_score"),
        col("text_preview"))
  }

  /** E4: embedding-cache invalidation — compare the stored manifest
    * against the current file listing; any difference ⇒ rebuild
    * (quran_mcp/embeddings.py:48-57, 80-84). */
  def manifestChanged(current: DataFrame, stored: DataFrame): Boolean = {
    val cur = current.select("name", "size")
    val st = stored.select("name", "size")
    cur.join(st, Seq("name", "size"), "left_anti").limit(1).count() > 0 ||
      st.join(cur, Seq("name", "size"), "left_anti").limit(1).count() > 0
  }
}
