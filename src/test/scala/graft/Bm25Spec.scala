package graft

import graft.operators.{Bm25, Postings}
import org.apache.spark.sql.functions._

/** BM25 against hand-computed values (SURVEY §7.3; k1=1.2, b=0.75,
  * Lucene/FTS5 idf form). */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // corpus: doc1 "cat sat", doc2 "cat cat dog", doc3 "dog runs far today"
  private lazy val docs = Seq(
    (1L, "cat sat"), (2L, "cat cat dog"), (3L, "dog runs far today")
  ).toDF("doc_id", "text")
  private lazy val p = Postings.build(docs, "doc_id", "text")
  private lazy val d = Postings.dictionary(p)
  private lazy val st = Postings.corpusStats(p)

  test("postings are (doc, term) term frequencies with doc length") {
    val rows = p.collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(rows.contains((2L, "cat", 2L)))
    assert(rows.contains((1L, "sat", 1L)))
    assert(p.where($"doc_id" === 2 && $"dl" =!= 3).count() === 0)
  }

  test("bm25 matches hand computation") {
    // N=3, avgdl=3. term "cat": df=2, idf=ln((3-2+0.5)/(2+0.5)+1)=ln(1.6)
    // doc2: tf=2, dl=3 -> w = ln(1.6) * 2*2.2 / (2 + 1.2*(0.25+0.75*3/3))
    val scored = Bm25.score(p, d, st, Seq("cat")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = math.log(1.6)
    val w2 = idf * (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 3.0 / 3.0))
    val w1 = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 2.0 / 3.0))
    assert(math.abs(scored(2L) - BigDecimal(w2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(scored(1L) - BigDecimal(w1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(!scored.contains(3L))
  }

  test("multi-term query sums per-term weights; topK orders desc") {
    val top = Bm25.topK(Bm25.score(p, d, st, Seq("cat", "dog")), 2).collect()
    assert(top.length === 2)
    assert(top(0).getDouble(1) >= top(1).getDouble(1))
  }

  test("bucketed postings layout makes the term groupBy shuffle-free (S9)") {
    Postings.saveBucketed(p, "postings_bucketed", numBuckets = 4)
    val t = spark.table("postings_bucketed")
    val dict = t.groupBy("term").agg(countDistinct("doc_id").as("df"))
    dict.collect()
    val plan = dict.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(term"),
      s"term aggregation still shuffles:\n${plan.take(600)}")
  }
}
