package graft

import graft.operators.Shards
import org.scalatest.funsuite.AnyFunSuite

/** Shard packing (Shards.packShards) — pins offset-packing semantics the
  * sf oracle can't isolate: exact budget boundaries, a straddling doc, an
  * oversized doc, and equality across partition widths (the two-pass
  * prefix sum must not depend on where the range cuts fall). */
class ShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("pack shards: boundaries, straddle, oversize, width-invariance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),            // cum_before 0  → shard 0
      (2L, "d e f"),            // cum_before 3  → shard 0
      (3L, "g h i j"),          // cum_before 6  → shard 1
      (4L, "k l m n o p q"),    // cum_before 10 → shard 2 (oversized: 7 > 5)
      (5L, "r")                 // cum_before 17 → shard 3
    ).toDF("doc_id", "text")
    val expect = Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L)
    for (w <- Seq(1, 2, 3, 5)) {
      val got = Shards.packShards(docs, "doc_id", "text", tokensPerShard = 5L, width = w)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expect, s"width=$w")
    }
  }

  test("subword measure: ceil(len/4) pieces per word; packing respects the measure") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "a bcde internationalization"), // 1 + 1 + ceil(20/4)=5 → 7
      (2L, ""),                            // no tokens → 0
      (3L, "abcd abcde")                   // ceil(4/4)=1 + ceil(5/4)=2 → 3
    ).toDF("doc_id", "text")
    val counts = docs.select(col("doc_id"),
      graft.functions.TextFns.subwordCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 7L, 2L -> 0L, 3L -> 3L))
    // packing with the subword measure cuts on subword budget, and the
    // two-pass prefix sum stays width-invariant under it
    val expect = Map(1L -> 0L, 2L -> 1L, 3L -> 1L) // cum_before 0, 7, 7 at budget 6
    for (w <- Seq(1, 2, 3)) {
      val got = Shards.packShards(docs, "doc_id", "text", tokensPerShard = 6L,
        width = w, measure = Shards.TokenMeasure.subwords)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expect, s"width=$w")
    }
  }

  test("shuffle order: exact permutation of the naive global form, width-invariant, seed-sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1L to 97L).toDF("doc_id")
    // the naive single-window spec the two-pass form must reproduce
    val naive = docs
      .withColumn("k", md5(concat(lit("ep0:"), col("doc_id").cast("string"))))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("k", "doc_id")).cast("long") - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (w <- Seq(1, 3, 8)) {
      val got = Shards.shuffleOrder(docs, "doc_id", "ep0", width = w)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === naive, s"width=$w diverges from the naive global order")
    }
    // positions are a permutation of 0..n-1
    assert(naive.values.toSeq.sorted === (0L until 97L))
    // a different seed gives a genuinely different epoch order
    val ep1 = Shards.shuffleOrder(docs, "doc_id", "ep1")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ep1 !== naive)
    assert(ep1.values.toSeq.sorted === (0L until 97L))
  }

  test("writeShards: every doc lands in exactly one shard; manifest is the receipt") {
    import spark.implicits._
    val docs = (1 to 40).map(i => (i.toLong, ("tok " * (i % 5 + 1)).trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val manifest = Shards.writeShards(docs, "doc_id", "text",
      tokensPerShard = 20L, outPath = dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDecimal(3)))).toMap
    // partition-column type inference reads `shard` back as int
    val data = spark.read.parquet(s"$dir/data")
      .withColumn("shard",
        org.apache.spark.sql.functions.col("shard").cast("long"))
    // partition completeness: every doc exactly once, text preserved
    assert(data.count() === 40L)
    assert(data.select("doc_id").distinct().count() === 40L)
    // manifest counts match the written partitions
    val byShard = data.groupBy("shard").agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("n_tok"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(manifest.view.mapValues(v => (v._1, v._2)).toMap === byShard)
    // the checksum is order-insensitive and independently recomputable
    val audit = Shards.shardManifest(spark, s"$dir/data", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDecimal(3)).toMap
    assert(manifest.view.mapValues(_._3).toMap === audit)
    // manifest JSON is readable and matches
    val mj = spark.read.json(s"$dir/manifest")
    assert(mj.count().toInt === manifest.size)
  }
}
