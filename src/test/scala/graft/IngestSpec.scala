package graft

import graft.operators.Ingest
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Ingestion slice over the reference's own corpus fixtures
  * (SURVEY §7.2 minimum slice; data/riyadussalihin/book_1.jsonl). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val book1 = "/root/reference/data/riyadussalihin/book_1.jsonl"

  test("book_1 validates fully (47 records per reference ingestion log)") {
    val raw = Ingest.readBooks(spark, book1)
    val valid = Ingest.validated(raw)
    assert(valid.count() === 47)
    assert(Ingest.quarantine(raw).count() === 0)
  }

  test("canonical narrator strips honorifics but keeps Arabic") {
    val valid = Ingest.validated(Ingest.readBooks(spark, book1))
    val narr = valid.select("canonical_narrator").where(col("canonical_narrator").isNotNull)
      .collect().map(_.getString(0))
    assert(narr.nonEmpty)
    assert(!narr.exists(_.toLowerCase.contains("may allah")), "honorific not stripped")
    // Arabic canonicalization survives (round-3 verdict fix)
    val ar = Seq(("أبو هريرة (رضي الله عنه)", 1)).toDF("n", "x")
      .select(TextFns.canonicalize($"n")).head().getString(0)
    assert(ar === "أبو هريرة")
  }

  test("book stats aggregate counts and sorted checksum examples") {
    val valid = Ingest.validated(Ingest.readBooks(spark, book1))
    val st = Ingest.bookStats(valid).head()
    assert(st.getAs[Long]("total_hadith") === 47)
    assert(st.getAs[Long]("unique_narrators") > 0)
    assert(st.getAs[Seq[String]]("checksum_examples").length <= 5)
  }

  test("language projection and embed payload (P1/P2)") {
    val valid = Ingest.validated(Ingest.readBooks(spark, book1))
    val r = valid.select(
      Ingest.languageText(col("texts"), "en").as("en"),
      Ingest.languageText(col("texts"), "ar").as("ar"),
      Ingest.embedPayload(col("narrator"), col("texts")).as("payload")).head()
    assert(r.getString(0) != null && r.getString(0).nonEmpty)
    assert(r.getString(1) != null && r.getString(1).nonEmpty)
    assert(r.getString(2).contains(r.getString(0).take(20)))
  }

  test("incremental anti-join: unchanged re-ingest is a no-op") {
    val valid = Ingest.validated(Ingest.readBooks(spark, book1))
      .select(Ingest.docId.as("doc_id"), col("checksum"))
    val changed = graft.operators.Incremental.changed(valid, valid, "doc_id", "checksum")
    assert(changed.count() === 0)
  }
}
