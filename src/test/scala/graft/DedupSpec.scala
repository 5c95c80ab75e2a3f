package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"), // exact dup of 1
    (3L, "the cat sat on the red mat"), // near dup
    (4L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups by content hash, survivor = min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dup = g.find(_.getLong(2) === 2L).get
    assert(dup.getLong(1) === 1L) // survivor
    assert(g.count(_.getLong(2) === 1L) === 2)
  }

  test("keepBest is deterministic and idempotent") {
    val once = Dedup.keepBest(docs, md5($"text"), Seq(asc("doc_id")))
    val twice = Dedup.keepBest(once, md5($"text"), Seq(asc("doc_id")))
    assert(once.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L, 4L))
    assert(twice.count() === once.count())
  }

  test("minhash LSH finds the exact dup pair; jaccard verify scores it 1.0") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
    val cand = Dedup.lshCandidatePairs(sigs, 4)
    val pairs = Dedup.jaccardVerify(docs, "doc_id", "text", cand, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash pairs at hamming 0 contain the exact dup; banding loses nothing <= maxHamming") {
    val sim = Dedup.simhash(docs, "doc_id", "text", 32)
    val banded = Dedup.simhashPairs(sim, maxHamming = 3, bits = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force reference on the tiny corpus
    val fp = sim.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- fp.keys; b <- fp.keys if a < b
      h = java.lang.Long.bitCount(fp(a) ^ fp(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded === brute)
  }

  test("near-dup plans contain no nested-loop join (round-3 verdict gate)") {
    val sim = Dedup.simhash(docs, "doc_id", "text", 32)
    val plans = Seq(
      Dedup.simhashPairs(sim, 3, 32).queryExecution.executedPlan.toString,
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1).queryExecution.executedPlan.toString,
      Dedup.ngramJaccardPairsSharedShingle(docs, "doc_id", "text", 3, 0.1).queryExecution.executedPlan.toString)
    plans.foreach(p => assert(!p.contains("BroadcastNestedLoopJoin"), "found nested loop"))
  }

  test("ngram jaccard respects the df cap (hot shingles generate no candidates)") {
    val many = (1L to 30L).map(i => (i, s"common shingle text block unique$i tail"))
      .toDF("doc_id", "text")
    // shared 3-shingle "common_shingle_text" has df=30 > cap=5 -> no pairs from it
    val pairs = Dedup.ngramJaccardPairsSharedShingle(many, "doc_id", "text", 3, 0.01, maxDf = 5)
    assert(pairs.count() === 0)
  }
}
