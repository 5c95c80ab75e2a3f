package graft

/** The soak harness's derived-corpus generators (the bench embeds
  * Soak.run per round; these pins keep the derivations honest). */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  test("embAt: rotation replicas are deterministic, id-disjoint, norm-preserving") {
    val emb = Seq((0L, Array(1f, 2f, 3f, 4f)), (1L, Array(5f, 6f, 7f, 8f)))
      .toDF("vec_id", "embedding")
    val x3 = Soak.embAt(emb, 3).orderBy("vec_id").collect()
    assert(x3.length === 6)
    assert(x3.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L, 5L))
    val v = x3.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(v(0L) === Seq(1f, 2f, 3f, 4f)) // k=0 keeps the source
    assert(v(2L) === Seq(2f, 3f, 4f, 1f)) // k=1 of vec 0: rotate left 1
    assert(v(4L) === Seq(3f, 4f, 1f, 2f)) // k=2 of vec 0
    assert(v(3L) === Seq(6f, 7f, 8f, 5f)) // k=1 of vec 1
    // norm-preserving: every replica keeps its source's length
    def n2(a: Seq[Float]) = a.map(x => x.toDouble * x).sum
    assert(n2(v(2L)) === n2(v(0L)) && n2(v(4L)) === n2(v(0L)))
    // rerun is byte-identical
    val again = Soak.embAt(emb, 3).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again === v)
  }

  test("corpusAt: replicas are mutated (not near-dups), originals untouched") {
    val docs = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val x2 = Soak.corpusAt(docs, 2).orderBy("doc_id").collect()
    assert(x2.length === 2)
    assert(x2(0).getString(1) === "alpha beta gamma delta epsilon zeta eta theta")
    assert(x2(1).getString(1) !== x2(0).getString(1))
  }
}
