package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination sweep (TextAnalysis.contaminationPairs) — the column
  * operators themselves (quality/lang-id/token-counts/fingerprints) are
  * oracle-covered; this pins the pair semantics the split oracle can't
  * isolate: sub-n docs, the exact-threshold boundary, and distinctness
  * (a repeated shared shingle counts once). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("contamination pairs: threshold boundary, short docs, distinctness") {
    import spark.implicits._
    val corpus = Seq(
      // shares shingles "a_b_c" and "b_c_d" with bench 100 → n_shared=2
      (1L, "a b c d"),
      // shares only "a_b_c" → below minOverlap=2
      (2L, "x a b c y"),
      // repeated shingle must count ONCE: "a_b_c" twice, "b_c_d" once
      (3L, "a b c a b c d"),
      // shorter than n tokens → no shingles, never flagged
      (4L, "a b"),
      (5L, "nothing in common here at all")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e")).toDF("bench_id", "text")
    val got = TextAnalysis.contaminationPairs(
      corpus, "doc_id", "text", bench, "bench_id", "text",
      n = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 3's distinct shared set is {a_b_c, b_c_d, (c_a_b? no) ...}:
    // its distinct shingles are a_b_c, b_c_a, c_a_b, b_c_d — shared = 2
    assert(got === Set((1L, 100L, 2L), (3L, 100L, 2L)))
  }
}
