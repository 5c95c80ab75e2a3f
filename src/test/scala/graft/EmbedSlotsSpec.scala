package graft

import graft.functions.{TextFns, VecFns}
import graft.operators.{Embed, Hybrid}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[graft.plans.EmbedSlots]] (the per-row slots expression, r13)
  * BIT-EQUAL to the old explode/groupBy/norm-join/collect_list chain it
  * replaced — same buckets, same quantized values, same na, same dropped
  * rows — on real corpus text. The old chain lives here as the
  * reference implementation (the dotHof doctrine). */
class EmbedSlotsSpec extends SparkSpec {

  // the pre-r13 embedSlots, verbatim (Hybrid.scala history): the
  // shuffled reference implementation the expression must reproduce
  private def oldChain(docs: DataFrame, idCol: String, textCol: String,
                       dim: Int): DataFrame = {
    val ent = Embed.hashEmbedEntries(docs, idCol, textCol, dim)
    val nrm = ent.groupBy("doc_id").agg(sqrt(sum(col("v") * col("v"))).as("n"))
    ent.join(nrm, "doc_id").where(col("n") > 0)
      .select(col("doc_id"), col("bucket"),
        round(round(col("v") / col("n"), 6) * lit(VecFns.Scale)).as("qs"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("bucket"), col("qs")))).as("e"))
      .select(col("doc_id"),
        transform(col("e"), x => x.getField("bucket")).as("buckets"),
        transform(col("e"), x => x.getField("qs")).as("qs"),
        sqrt(aggregate(transform(col("e"), x => x.getField("qs") * x.getField("qs")),
          lit(0.0), (a, v) => a + v)).as("na"))
  }

  private def asMap(df: DataFrame) = df.collect().map { r =>
    r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Double](2), r.getDouble(3)))
  }.toMap

  test("hash31Bytes equals the hex-string hash31Local on adversarial inputs") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cases = Seq("", "a", "hello", "عربى", "0", "\u0000x",
      "a" * 300, "münchen", "🎈", "high￿plane") ++
      (0 until 200).map(i => s"tok$i")
    cases.foreach { s =>
      val slow = { // the pre-r13 hex-string form, inlined as the reference
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        val hex = d.map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2147483647L
      }
      assert(TextFns.hash31Bytes(md,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) === slow, s"input=$s")
      assert(TextFns.hash31Local(s) === slow, s"local input=$s")
    }
  }

  test("per-row slots expression is bit-equal to the shuffled chain on real documents") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text"))
    val neu = asMap(Hybrid.embedSlots(docs, "doc_id", "text", 64))
    val old = asMap(oldChain(docs, "doc_id", "text", 64))
    assert(neu.keySet === old.keySet)
    neu.foreach { case (id, (b, q, na)) =>
      val (ob, oq, ona) = old(id)
      assert(b === ob, s"buckets drift doc=$id")
      assert(q === oq, s"qs drift doc=$id")
      assert(na === ona, s"na drift doc=$id") // exact ==, not tolerance
    }
  }

  test("token-less and sign-cancelled documents drop; cancelled BUCKETS are kept") {
    import spark.implicits._
    // "ab" and "ba" may or may not cancel — build a guaranteed cancel
    // pair instead: find two single-token docs whose tokens share a
    // bucket with opposite signs at dim=4
    val dim = 4
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def hs(t: String) = {
      val h = TextFns.hash31Local(t)
      ((h % dim).toInt, if ((h / dim) % 2 == 0) 1.0 else -1.0)
    }
    val byBucket = words.map(w => (w, hs(w))).groupBy(_._2._1)
    val cancel = byBucket.values.flatMap { ws =>
      for {
        a <- ws.find(_._2._2 > 0)
        b <- ws.find(_._2._2 < 0)
      } yield (a._1, b._1)
    }.headOption
    val rows = Seq((1L, ""), (3L, "alpha beta gamma")) ++
      cancel.map { case (a, b) => (2L, s"$a $b") }
    val out = Hybrid.embedSlots(rows.toDF("doc_id", "text"), "doc_id", "text", dim)
      .collect().map(_.getLong(0)).toSet
    assert(!out.contains(1L), "token-less doc must drop")
    cancel.foreach { _ => assert(!out.contains(2L), "fully-cancelled doc must drop") }
    assert(out.contains(3L))
    // a cancelled bucket inside a surviving doc stays as a qs=0 slot
    cancel.foreach { case (a, b) =>
      val mixed = Seq((7L, s"$a $b alpha beta gamma")).toDF("doc_id", "text")
      val neu = asMap(Hybrid.embedSlots(mixed, "doc_id", "text", dim))
      val old = asMap(oldChain(mixed, "doc_id", "text", dim))
      assert(neu === old)
    }
  }

  test("null array elements are skipped, never emitted or NPE'd (TermTf + EmbedSlots)") {
    // the tokenizer never yields null tokens, but checkInputDataTypes
    // accepts containsNull=true (Spark marks split/transform output
    // conservatively) — a null element must act like an absent token
    // (r13 advice), identically in the interpreted and codegen paths
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, Seq[String]("a", null, "b", "a", null)),
      (2L, Seq[String](null, null)))
      .toDF("id", "toks")
    val tf = rows.select($"id", graft.plans.TermTf($"toks").as("tf")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getInt(1)))).toMap
    assert(tf(1L) === Seq(("a", 2), ("b", 1)))
    assert(tf(2L) === Seq(), "all-null token array = empty counts")
    val clean = Seq((1L, Seq("a", "b", "a"))).toDF("id", "toks")
      .select(graft.plans.EmbedSlots($"toks", 8).as("s")).head()
    val dirty = rows.where($"id" === 1)
      .select(graft.plans.EmbedSlots($"toks", 8).as("s")).head()
    assert(dirty === clean, "null elements must not shift the slots")
    val allNull = rows.where($"id" === 2)
      .select(graft.plans.EmbedSlots($"toks", 8).as("s")).head()
    assert(allNull.isNullAt(0), "all-null tokens = token-less doc → null slots")
  }
}
