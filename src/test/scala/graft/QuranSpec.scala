package graft

import graft.operators.Quran
import graft.sources.Npz
import org.apache.spark.sql.functions._

/** Second-engine lifecycle over the reference's real tafsir corpus and its
  * bundled npz embedding cache (reference: quran_mcp modules). */
class QuranSpec extends SparkSpec {

  private val corpusDir = "/root/reference/data/quran"
  private val npzPath = "/root/reference/data/indexes/quran/embeddings.npz"
  private lazy val corpus = Quran.load(spark, corpusDir).cache()
  private lazy val emb = Npz.embeddings(spark, npzPath).cache()

  test("corpus loads 6236 entries across 114 surahs (S2/A3/A4)") {
    val st = Quran.indexStatus(corpus).head()
    assert(st.getLong(0) === 6236)
    assert(st.getLong(1) === 114)
  }

  test("npz import yields 6236 L2-normalized 384-d vectors (S12)") {
    assert(emb.count() === 6236)
    val r = emb.where(col("verse_key") === "1:1")
      .select(size(col("embedding")),
        graft.functions.VecFns.norm2(col("embedding").cast("array<double>"))).head()
    assert(r.getInt(0) === 384)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-3) // normalize_embeddings=True upstream
  }

  test("npz parse matches an independently-decoded golden digest (S12)") {
    // Golden computed OUTSIDE Spark (numpy decode of the same npz;
    // round-half-up ×1e7 integer grid, md5 per vector, md5 over the
    // verse_key-sorted "key,dim,vec_md5" lines). Pins the PARSE itself:
    // the DuckDB oracle for npz_embeddings replays Verify's own dump, so
    // it checks digest-expression parity, not byte decoding — this does.
    val golden = "a70d2e5abef9806acd5fd860d61c847f"
    val rows = emb.select(col("verse_key"),
        size(col("embedding")).cast("long").as("dim"),
        md5(array_join(transform(col("embedding"),
          x => round(x.cast("double") * lit(1e7), 0).cast("long").cast("string")),
          ",")).as("vec_md5"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val joined = rows.map { case (k, d, m) => s"$k,$d,$m" }.mkString("\n")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.length === 6236)
    assert(digest === golden)
  }

  test("point lookup returns the verse (J5)") {
    val v = Quran.getVerse(corpus, "2:255")
    assert(v.count() === 1)
    assert(v.head().getAs[Int]("surah") === 2)
  }

  test("fts-only search returns deduped ranked hits (degraded mode)") {
    val hits = Quran.search(corpus, None, "mercy forgiveness", None, n = 5).collect()
    assert(hits.nonEmpty && hits.length <= 5)
    // scores in [0,1], non-increasing
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // degraded weights: wv=0 -> score == wf-weighted fts signal
    assert(hits.forall(_.getAs[Double]("vector_score") === 0.0))
    // text-block dedupe: no duplicate previews
    val previews = hits.map(_.getAs[String]("text_preview"))
    assert(previews.distinct.length === previews.length)
  }

  test("hybrid search fuses real vectors by verse_key with greatest-merge (J3/F15)") {
    // use a real corpus vector as the query -> its own verse must rank top
    val qv = emb.where(col("verse_key") === "1:1").head().getSeq[Float](1).toArray
    val hits = Quran.search(corpus, Some(emb), "fatihah opening", Some(qv), n = 5).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("verse_key") === "1:1")
    assert(hits.head.getAs[Double]("vector_score") > 0.99)
  }

  test("text_plain fallback strips html and trailing footnote digits (F20)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tafsir").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "surah_999.jsonl"), "UTF-8")
    w.println("""{"surah":999,"ayah":1,"verse_key":"999:1","slug":"x","text_arabic_simple":"<p>نص التفسير ١٢٣</p>"}""")
    w.close()
    val row = Quran.load(spark, dir.toString).head()
    assert(row.getAs[String]("text_plain") === "نص التفسير")
  }

  test("weight resolution handles modes and degradation (F16)") {
    assert(Quran.resolveWeights("hybrid", semanticOk = true) === (0.6, 0.4))
    assert(Quran.resolveWeights("semantic", semanticOk = true) === (1.0, 0.0))
    assert(Quran.resolveWeights("fts", semanticOk = true) === (0.0, 1.0))
    assert(Quran.resolveWeights("semantic", semanticOk = false) === (0.0, 1.0))
    assert(Quran.resolveWeights("hybrid", semanticOk = false) === (0.0, 0.4))
  }

  test("manifest comparison detects cache invalidation (E4)") {
    import spark.implicits._
    val cur = Seq(("surah_001.jsonl", 114449L), ("surah_002.jsonl", 2805165L)).toDF("name", "size")
    val same = Seq(("surah_001.jsonl", 114449L), ("surah_002.jsonl", 2805165L)).toDF("name", "size")
    val changed = Seq(("surah_001.jsonl", 999L), ("surah_002.jsonl", 2805165L)).toDF("name", "size")
    assert(!Quran.manifestChanged(cur, same))
    assert(Quran.manifestChanged(cur, changed))
  }
}
