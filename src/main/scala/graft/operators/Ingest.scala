package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion & validation of the reference's hadith JSONL corpus
  * (S1/P1/P2/P7/A1 — reference: mcp_server/apps/validation.py:18-58,
  * models.py:23-67).
  *
  * Spark shape: schema-on-read with a PERMISSIVE corrupt-record channel,
  * a validation predicate splitting valid/quarantine (the reference's
  * pydantic gate), derived columns at ingest (canonical_narrator), and a
  * groupBy book stats job. At scale the silver table is partitioned by
  * book_id so S3-style book selection is partition pruning.
  */
object Ingest {

  val textSegment: StructType = StructType(Seq(
    StructField("language", StringType), StructField("content", StringType)))

  val hadithSchema: StructType = StructType(Seq(
    StructField("collection_slug", StringType),
    StructField("collection_name", StringType),
    StructField("book_id", StringType),
    StructField("book_title_en", StringType),
    StructField("book_title_ar", StringType),
    StructField("chapter_id", StringType),
    StructField("chapter_number_en", StringType),
    StructField("chapter_number_ar", StringType),
    StructField("chapter_title_en", StringType),
    StructField("chapter_title_ar", StringType),
    StructField("hadith_id_site", StringType),
    StructField("hadith_num_global", StringType),
    StructField("hadith_num_in_book", StringType),
    StructField("texts", ArrayType(textSegment)),
    StructField("narrator", StringType),
    StructField("grading", ArrayType(StringType)),
    StructField("references", ArrayType(StructType(Seq(
      StructField("label", StringType), StructField("value", StringType))))),
    StructField("topics", ArrayType(StringType)),
    StructField("footnotes", ArrayType(StringType)),
    StructField("source_url", StringType),
    StructField("scraped_at", StringType),
    StructField("checksum", StringType),
    StructField("_corrupt", StringType)))

  /** S1: schema-on-read scan of `book_*.jsonl` with corrupt-record
    * side channel (the JSON-decode half of the pydantic gate). */
  def readBooks(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(hadithSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** P7: bilingual-text validation predicate — languages must be exactly
    * {en, ar} (models.py:56-62). */
  def isValid: Column =
    col("_corrupt").isNull &&
      array_sort(array_distinct(transform(col("texts"), t => t.getField("language")))) ===
        array(lit("ar"), lit("en"))

  /** Valid rows with derived canonical_narrator (models.py:64-67).
    * Null-safe split: a missing/null `texts` array makes the validation
    * predicate NULL, and `where(p)` / `where(!p)` would BOTH drop such
    * rows — coalescing to false routes them to quarantine instead of
    * losing them without trace. */
  def validated(raw: DataFrame): DataFrame =
    raw.where(coalesce(isValid, lit(false))).drop("_corrupt")
      .withColumn("canonical_narrator", TextFns.canonicalize(col("narrator")))

  /** Quarantine channel (failed JSON decode or failed validation). */
  def quarantine(raw: DataFrame): DataFrame =
    raw.where(!coalesce(isValid, lit(false)))

  /** Max-error policy (validation.py:43-49): book_ids whose quarantine
    * count reaches the threshold — the driver aborts those books. */
  def booksOverMaxErrors(quarantined: DataFrame, maxErrors: Int = 10): DataFrame =
    quarantined.groupBy("book_id").agg(count("*").as("n_errors"))
      .where(col("n_errors") >= maxErrors)

  /** P1: first content for a language from the texts array
    * (embeddings.py:45-46, fts.py:33-38). */
  def languageText(texts: Column, lang: String): Column =
    element_at(filter(texts, t => t.getField("language") === lang), 1).getField("content")

  /** P2: embedding payload render "Narrator: X\n{en}\n\n{ar}"
    * (embeddings.py:44-49). */
  def embedPayload(narrator: Column, texts: Column): Column =
    concat_ws("",
      when(narrator.isNotNull, concat(lit("Narrator: "), narrator, lit("\n"))).otherwise(lit("")),
      coalesce(languageText(texts, "en"), lit("")),
      lit("\n\n"),
      coalesce(languageText(texts, "ar"), lit("")))

  /** F23: doc_id synthesis slug:book:site (embeddings.py:40-41). */
  def docId: Column =
    concat_ws(":", col("collection_slug"), col("book_id"), col("hadith_id_site"))

  /** A1: per-book stats — count, distinct canonical narrators, first-5
    * checksums (sorted for determinism; the reference keeps file order,
    * which has no distributed equivalent). */
  def bookStats(valid: DataFrame): DataFrame =
    valid.groupBy("book_id").agg(
      count("*").as("total_hadith"),
      countDistinct("canonical_narrator").as("unique_narrators"),
      slice(array_sort(collect_list("checksum")), 1, 5).as("checksum_examples"))

  /** A2: ingestion totals across books (ingestion.py:129-158). */
  def ingestionTotals(stats: DataFrame): DataFrame =
    stats.agg(count("*").as("books"),
      sum("total_hadith").as("total_hadith"),
      sum("unique_narrators").as("narrator_slots"))

  /** A6: catalog rollup — per-book rows + the global totals the
    * reference's index.json carries (cli.py:37-67). */
  def catalogRollup(valid: DataFrame): DataFrame =
    valid.groupBy("book_id").agg(
      // min, not first: every row in a book carries the same title, and
      // min is deterministic under any partitioning (first is not)
      min("book_title_en").as("title_en"),
      count("*").as("total_hadiths"),
      countDistinct("chapter_id").as("total_chapters"))

  /** S4/S5: JSONL document sink + single-file catalog sink. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
  def writeCatalog(catalog: DataFrame, path: String): Unit =
    catalog.coalesce(1).write.mode("overwrite").json(path)

  /** T5: sample/peek (fts.py:77-81, embeddings.py:90-97). */
  def peek(df: DataFrame, n: Int = 3): DataFrame = df.limit(n)

  /** Silver parquet layout, partitioned by book_id — S3's by-hand book
    * path selection becomes partition pruning (a book filter never
    * touches other books' files). */
  def writeSilver(valid: DataFrame, path: String): Unit =
    valid.write.mode("overwrite").partitionBy("book_id").parquet(path)

  /** S14/F25/F26: per-book ingestion log — stats rows stamped with the
    * run timestamp, serialized as one JSON document per book
    * (reference: mcp_server/apps/ingestion.py:82-93 writes
    * `{book}_{date}.json` with an ISO timestamp). */
  def writeIngestionLog(stats: DataFrame, path: String): Unit =
    stats
      .withColumn("logged_at", date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX"))
      .select(to_json(struct(col("*"))).as("value"))
      .write.mode("overwrite").text(path)
}
