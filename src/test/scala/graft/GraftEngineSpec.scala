package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._

/** Serving facade + partition-pruned silver layout. */
class GraftEngineSpec extends SparkSpec {

  test("hadith engine opens once and serves search/status/peek") {
    val eng = Graft.openHadith(spark, "/root/reference/data/riyadussalihin/book_1.jsonl")
    val st = eng.status.head()
    assert(st.getLong(0) === 47)
    assert(eng.peek(2).count() === 2)
    assert(eng.search("modesty and shyness", n = 3).count() <= 3)
  }

  test("quran engine serves point lookup, status and similar-verses") {
    val eng = Graft.openQuran(spark, "/root/reference/data/quran",
      Some("/root/reference/data/indexes/quran/embeddings.npz"))
    assert(eng.status.head().getLong(0) === 6236)
    assert(eng.getVerse("1:1").count() === 1)
    val sim = eng.similarVerses("1:1", n = 3).collect()
    assert(sim.nonEmpty)
    assert(sim.head.getAs[String]("verse_key") === "1:1") // self is nearest
  }

  test("persisted index layers round-trip: warm open serves identical results (S9)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val glob = "/root/reference/data/riyadussalihin/book_{1,2}.jsonl"
    val cold = Graft.openHadith(spark, glob)
    GraftIndexes.writeHadith(spark, glob, s"$dir/hadith")
    val warm = GraftIndexes.openHadith(spark, s"$dir/hadith")
    val q = "Hadith narrated by Abu Hurairah"
    assert(warm.search(q, n = 5).collect().toSeq === cold.search(q, n = 5).collect().toSeq)
    // repeated warm queries are deterministic over the resident index
    assert(warm.search(q, n = 5).collect().toSeq === warm.search(q, n = 5).collect().toSeq)

    GraftIndexes.writeQuran(spark, "/root/reference/data/quran", s"$dir/quran",
      Some("/root/reference/data/indexes/quran/embeddings.npz"))
    val wq = GraftIndexes.openQuran(spark, s"$dir/quran")
    val cq = Graft.openQuran(spark, "/root/reference/data/quran",
      Some("/root/reference/data/indexes/quran/embeddings.npz"))
    assert(wq.search("mercy forgiveness charity", 5, "fts").collect().toSeq ===
      cq.search("mercy forgiveness charity", 5, "fts").collect().toSeq)
    assert(wq.getVerse("2:255").select("verse_key", "slug").count() === 1)
  }

  test("silver layout partition-prunes book filters (S3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-silver").toString
    val valid = Ingest.validated(Ingest.readBooks(spark,
      "/root/reference/data/riyadussalihin/book_{1,2}.jsonl"))
    Ingest.writeSilver(valid, dir)
    val pruned = spark.read.parquet(dir).where(col("book_id") === "1")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(book_id"), plan.take(400))
    assert(pruned.count() === 47)
  }
}
