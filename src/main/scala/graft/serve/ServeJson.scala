package graft.serve

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.{Graft, Router}
import graft.functions.Scoring
import org.apache.spark.sql.DataFrame

/** JSON envelopes for the transports — the reference's response shapes
  * (mcp_server/tools.py:150-180: intent/mode/weights/total_candidates/
  * hits with per-hit score breakdown) rendered from the engines' result
  * frames. Jackson ships with Spark, so the transports add no
  * dependencies. All driver-side: every payload is a ≤n-row result the
  * engine already bounded. */
private[graft] object ServeJson {
  val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()

  /** Result rows → array of objects, via Spark's own per-row JSON
    * encoder (handles nested/array columns identically to the sinks). */
  def rowsJson(df: DataFrame): ArrayNode = {
    val out = arr()
    df.toJSON.collect().foreach(s => out.add(mapper.readTree(s)))
    out
  }

  def weightsJson(w: Scoring.Weights): ObjectNode = {
    val o = obj()
    o.put("weight_vector", w.wVector)
    o.put("weight_fts", w.wFts)
    o.put("weight_term_coverage", w.wCoverage)
    o.put("bonus_phrase", w.bonusPhrase)
    o.put("bonus_proximity", w.bonusProximity)
    o
  }

  /** The hybrid_search envelope (tools.py:150-180). `hits` re-nests the
    * signal columns as the per-hit `breakdown`; `totalCandidates` is the
    * FUSED pool size before the top-n cut, as the reference reports it
    * (tools.py counts the scored pool, not the truncated hits). */
  def hybridEnvelope(query: String, mode: String, hits: Array[org.apache.spark.sql.Row],
                     schema: org.apache.spark.sql.types.StructType,
                     totalCandidates: Int): ObjectNode = {
    val intent = Router.route(query)
    val o = obj()
    o.put("intent", intent.qtype)
    o.put("mode", mode)
    o.set[ObjectNode]("weights", weightsJson(Scoring.preset(mode)))
    o.put("total_candidates", totalCandidates)
    val hs = arr()
    val idx = schema.fieldNames.zipWithIndex.toMap
    val breakdownCols = Seq("vector_similarity", "fts_signal", "phrase_bonus", "term_coverage")
    hits.foreach { r =>
      val h = obj()
      def putStr(k: String): Unit =
        if (idx.contains(k) && !r.isNullAt(idx(k))) h.put(k, r.getString(idx(k)))
      putStr("doc_id"); putStr("book_id"); putStr("narrator"); putStr("snippet")
      if (idx.contains("score") && !r.isNullAt(idx("score")))
        h.put("score", r.getDouble(idx("score")))
      val b = obj()
      breakdownCols.foreach(k =>
        if (idx.contains(k) && !r.isNullAt(idx(k))) b.put(k, r.getDouble(idx(k))))
      h.set[ObjectNode]("breakdown", b)
      hs.add(h)
    }
    o.set[ArrayNode]("hits", hs)
    o
  }

  def searchEnvelope(eng: Graft.HadithEngine, query: String, n: Int,
                     mode: String): ObjectNode = {
    val (df, pool) = eng.searchWithCandidates(query, n, mode)
    hybridEnvelope(query, mode, df.collect(), df.schema, pool)
  }

  /** The same envelope built from the typed sub-ms search path
    * ([[Graft.HadithEngine.searchTyped]]) — what the transports serve.
    * ServeTransportsSpec pins structural equality with the DataFrame
    * form (ObjectNode equality is field-order-insensitive). */
  def hybridEnvelopeTyped(query: String, mode: String,
                          hits: Seq[graft.operators.Resident.SearchHit],
                          totalCandidates: Int): ObjectNode = {
    val intent = Router.route(query)
    val o = obj()
    o.put("intent", intent.qtype)
    o.put("mode", mode)
    o.set[ObjectNode]("weights", weightsJson(Scoring.preset(mode)))
    o.put("total_candidates", totalCandidates)
    val hs = arr()
    hits.foreach { h =>
      val hn = obj()
      if (h.docId != null) hn.put("doc_id", h.docId)
      if (h.bookId != null) hn.put("book_id", h.bookId)
      if (h.narrator != null) hn.put("narrator", h.narrator)
      if (h.snippet != null) hn.put("snippet", h.snippet)
      hn.put("score", h.score)
      val b = obj()
      b.put("vector_similarity", h.vectorSimilarity)
      b.put("fts_signal", h.ftsSignal)
      b.put("phrase_bonus", h.phraseBonus)
      b.put("term_coverage", h.termCoverage)
      hn.set[ObjectNode]("breakdown", b)
      hs.add(hn)
    }
    o.set[ArrayNode]("hits", hs)
    o
  }

  def searchEnvelopeTyped(eng: Graft.HadithEngine, query: String, n: Int,
                          mode: String): ObjectNode = {
    val (hits, pool) = eng.searchTypedScored(query, n, mode)
    hybridEnvelopeTyped(query, mode, hits, pool)
  }

  /** Typed twin of [[rowsJson]] over the tafsir search envelope — same
    * field names/values as the DataFrame result's toJSON rows. */
  def tafsirHitsJson(hits: Seq[graft.operators.Resident.QuranHit]): ArrayNode = {
    val out = arr()
    hits.foreach { h =>
      val o = obj()
      if (h.verseKey != null) o.put("verse_key", h.verseKey)
      o.put("surah", h.surah); o.put("ayah", h.ayah)
      o.put("score", h.score); o.put("vector_score", h.vectorScore)
      o.put("fts_score", h.ftsScore)
      if (h.textPreview != null) o.put("text_preview", h.textPreview)
      out.add(o)
    }
    out
  }

  /** vector_index_status / fts_status analogs over the resident index. */
  def vectorStatus(eng: Graft.HadithEngine): ObjectNode = {
    val r = eng.status.head()
    val o = obj()
    o.put("documents", r.getLong(0))
    o.put("books", r.getLong(1))
    o.put("dimension", eng.index.dim)
    o.put("ok", true)
    o
  }

  def ftsStatus(eng: Graft.HadithEngine): ObjectNode = {
    val r = eng.status.head()
    val o = obj()
    o.put("documents", r.getLong(0))
    val fields = obj()
    graft.operators.HadithSearch.Fields.foreach { f =>
      fields.put(f, eng.index.dictLocal(f).map(_.size.toLong)
        .getOrElse(eng.index.dicts(f).count()))
    }
    o.set[ObjectNode]("terms_per_field", fields)
    o.put("ok", true)
    o
  }

  def err(msg: String): ObjectNode = { val o = obj(); o.put("error", msg); o }
}
