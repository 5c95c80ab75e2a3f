package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 scoring as a DataFrame job (SURVEY.md §7.3; reference delegates to
  * SQLite FTS5's bm25() aux function: mcp_server/apps/fts.py:98-101,
  * quran_mcp/search.py:119-124).
  *
  * Query time is one broadcast join of the (tiny) query-term set against the
  * postings table, a per-row weight expression, and a groupBy(doc_id) sum —
  * i.e. a map-side-combinable aggregation whose only shuffle is on doc_id.
  * With term-bucketed postings at scale the probe reads only matching
  * buckets; the over-fetch/rerank policy (max(50, n·5) candidates,
  * reference: tools.py:87,93) happens after this with a TakeOrderedAndProject.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Per-(doc,term) BM25 weight, then summed per doc.
    * idf = ln((N - df + 0.5)/(df + 0.5) + 1)            (Lucene/FTS5 form)
    * w   = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    */
  def score(postings: DataFrame, dictionary: DataFrame, stats: DataFrame,
            queryTerms: Seq[String], k1: Double = K1, b: Double = B): DataFrame = {
    // term probes are FILTERS, not joins against a term list: a filter
    // prunes cached columnar batches by min/max term stats (and reaches
    // PushedFilters on a parquet scan), so a probe over term-clustered
    // postings SEEKS like the inverted index it stands in for — the
    // broadcast-join form scanned every posting row per query
    val terms = queryTerms.distinct
    scoreMatching(postings, dictionary, stats,
      col("term").isin(terms: _*), k1, b)
  }

  /** [[score]] with an arbitrary TERM PREDICATE instead of an exact
    * term list — the FTS5 prefix-query face (`forgiv*` scores every
    * term the prefix matches; `startsWith` prunes term-clustered
    * batches / reaches parquet as StringStartsWith exactly like the
    * isin form). Same formula text as [[score]] — one body, two
    * probes. */
  def scoreMatching(postings: DataFrame, dictionary: DataFrame,
                    stats: DataFrame, termPred: Column,
                    k1: Double = K1, b: Double = B): DataFrame = {
    val matched = postings.where(termPred)
      .join(broadcast(dictionary.where(termPred)), "term")
      .crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val w = idf * ((col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl)))
    matched
      .select(col("doc_id"), w.as("w"))
      .groupBy("doc_id")
      .agg(round(sum("w"), 6).as("bm25"))
  }

  /** [[score]] with a DRIVER-RESIDENT dictionary slice and corpus
    * stats — the warm-serving form. The probe terms' (term, df) pairs and
    * the two corpus scalars arrive as plain values (collected once at
    * engine open from the same cached layers the distributed form joins),
    * so the per-query plan is the postings filter + one broadcast
    * LocalRelation join + the aggregation: no dictionary-scan job, no
    * broadcast build over a cached layer, no stats crossJoin. The weight
    * arithmetic keeps the distributed form's exact expression types and
    * order (long literals where [[score]] had long columns), so scores
    * are bit-equal. For BOUNDED vocabularies (the engine corpora) only —
    * the distributed [[score]] stays the unbounded-corpus scale path. */
  def scoreResident(postings: DataFrame, termDf: Seq[(String, Long)],
                    nDocs: Long, sumDl: Long,
                    k1: Double = K1, b: Double = B): DataFrame = {
    val spark = postings.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dictLocal = spark.createDataFrame(
      java.util.Arrays.asList(termDf.map { case (t, d) => Row(t, d) }: _*),
      StructType(Seq(StructField("term", StringType), StructField("df", LongType))))
    val matched = postings.where(col("term").isin(termDf.map(_._1): _*))
      .join(broadcast(dictLocal), "term")
    val avgdl = lit(sumDl).cast("double") / lit(nDocs)
    val idf = log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val w = idf * ((col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl)))
    matched
      .select(col("doc_id"), w.as("w"))
      .groupBy("doc_id")
      .agg(round(sum("w"), 6).as("bm25"))
  }

  /** Candidate selection: ORDER BY bm25 DESC LIMIT k — compiles to
    * TakeOrderedAndProject (no global sort materialization). */
  def topK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(desc("bm25"), asc("doc_id")).limit(k)
}
