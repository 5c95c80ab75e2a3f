package graft

import graft.operators._
import graft.sources.Npz
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The serving facade — what the reference exposes over MCP/HTTP/CLI
  * (mcp_server/http_server.py, mcp_stdio.py, apps/hybrid_cli.py,
  * fts_cli.py), minus the transports (out of engine scope, SURVEY §7.1).
  *
  * Unlike the reference's per-request index opens (tools.py:53-57 — the
  * inefficiency SURVEY §7.5 flags), an engine instance holds its cached
  * DataFrames for the life of the session; every search is a plan over
  * resident data.
  */
object Graft {

  /** Hadith engine over validated corpus JSONL. */
  def openHadith(spark: SparkSession, booksGlob: String): HadithEngine = {
    val silver = HadithSearch.silver(Ingest.validated(Ingest.readBooks(spark, booksGlob)))
      .cache()
    silver.count() // materialize once
    new HadithEngine(silver)
  }

  /** Tafsir engine over the quran corpus + optional npz vector cache. */
  def openQuran(spark: SparkSession, corpusDir: String,
                npzPath: Option[String] = None): QuranEngine = {
    val corpus = Quran.load(spark, corpusDir).cache()
    corpus.count()
    val emb = npzPath.map(p => Npz.embeddings(spark, p).cache())
    emb.foreach(_.count())
    new QuranEngine(corpus, emb)
  }

  final class HadithEngine private[graft] (val silver: DataFrame) {
    /** hybrid_search parity (tools.py:39-175). */
    def search(query: String, n: Int = 10, mode: String = "balanced"): DataFrame =
      HadithSearch.search(silver, query, n, mode)

    /** fts_status / vector_index_status analog (A3). */
    def status: DataFrame =
      silver.agg(count("*").as("documents"),
        countDistinct("book_id").as("books"),
        countDistinct("narrator").as("narrators"))

    /** T5 peek. */
    def peek(n: Int = 3): DataFrame = Ingest.peek(silver, n)
  }

  final class QuranEngine private[graft] (val corpus: DataFrame,
                                          val emb: Option[DataFrame]) {
    /** search_tafsir parity (quran_mcp/search.py:178-318). When no
      * vector cache or query vector is present the engine serves the
      * reference's own degraded mode (search.py:212-215). */
    def search(query: String, n: Int = 5, mode: String = "hybrid",
               queryVec: Option[Array[Float]] = None): DataFrame =
      Quran.search(corpus, emb, query, queryVec, n, mode)

    /** get_verse parity (server.py:77-107). */
    def getVerse(verseKey: String): DataFrame = Quran.getVerse(corpus, verseKey)

    /** index_status parity (server.py:109-113). */
    def status: DataFrame = Quran.indexStatus(corpus)

    /** Nearest corpus vector to a verse's own embedding — utility the
      * reference exposes through search-by-content. */
    def similarVerses(verseKey: String, n: Int = 5): DataFrame = {
      val e = emb.getOrElse(sys.error("no embedding cache loaded"))
      val qv = e.where(col("verse_key") === verseKey)
        .head().getSeq[Float](1).toArray
      search("", n, "semantic", Some(qv))
    }
  }
}
