package graft.operators

import graft.functions.VecFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY.md §2.9; reference:
  * ChromaDB HNSW cosine — mcp_server/apps/embeddings.py:277-321 — and NumPy
  * brute-force matmul — quran_mcp/search.py:145-176).
  *
  * Baseline is exact brute-force cosine + TakeOrderedAndProject: on a
  * cluster this is an embarrassingly parallel scan (the query vector is a
  * broadcast literal), which is the right default for one-off top-k.
  * The scale path for repeated queries is [[lshBuckets]]: random-hyperplane
  * sign buckets turn candidate generation into an equi-join, pruning the
  * scan to matching buckets.
  */
object Similarity {

  /** Exact cosine top-k of `emb`'s `vecCol` against one query vector. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryVec: Column, k: Int, excludeId: Option[Long] = None): DataFrame = {
    val base = emb.select(col(idCol).cast("long").as("vec_id"),
      round(VecFns.cosineQ(VecFns.quantize(col(vecCol)), VecFns.quantize(queryVec)), 6).as("cos"))
    val filtered = excludeId.map(i => base.where(col("vec_id") =!= i)).getOrElse(base)
    filtered.orderBy(desc("cos"), asc("vec_id")).limit(k)
  }

  /** k-NN join: top-k neighbors for every probe row. Probes are broadcast
    * (they are the small side); ranking is a per-probe window. */
  def knnJoin(emb: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
              k: Int): DataFrame = {
    val corpus = emb.select(col(idCol).cast("long").as("nbr_id"),
      VecFns.quantize(col(vecCol)).as("qv"))
    val probeQ = probes.select(col(idCol).cast("long").as("probe_id"),
      VecFns.quantize(col(vecCol)).as("pv"))
    val scored = corpus.crossJoin(broadcast(probeQ))
      .where(col("nbr_id") =!= col("probe_id"))
      .select(col("probe_id"), col("nbr_id"),
        round(VecFns.cosineQ(col("pv"), col("qv")), 6).as("cos"))
    val w = Window.partitionBy(col("probe_id")).orderBy(desc("cos"), asc("nbr_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("probe_id", "nbr_id", "cos", "rn")
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cos ≥ minCos). */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val q = emb.select(col(idCol).cast("long").as("id"), VecFns.quantize(col(vecCol)).as("qv"))
    val a = q.select(col("id").as("a"), col("qv").as("va"))
    val b = q.select(col("id").as("b"), col("qv").as("vb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), round(VecFns.cosineQ(col("va"), col("vb")), 6).as("cos"))
      .where(col("cos") >= minCos)
  }

  /** Random-hyperplane LSH bucket key (nBits sign bits). Hyperplane h_j is a
    * deterministic pseudo-random ±1 vector derived from md5(j:dim) — fully
    * portable, no stored model. Bucket = the nBits-bit sign pattern of the
    * projections. */
  def lshBucket(vecQ: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val proj = (0 until dim).map { d =>
        val h = graft.functions.TextFns.hash31(lit(s"$j:$d"))
        val sign = when(h % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
        element_at(vecQ, d + 1) * sign
      }.reduce(_ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: candidates share the query's bucket, then exact rerank.
    * (Recall < 1 by construction; the exact path remains the oracle.) */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String, queryVec: Column,
              dim: Int, nBits: Int, k: Int): DataFrame = {
    val q = emb.select(col(idCol).cast("long").as("vec_id"), VecFns.quantize(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), dim, nBits))
    val qvec = VecFns.quantize(queryVec)
    val qBucket = lshBucket(qvec, dim, nBits)
    q.where(col("bucket") === qBucket)
      .select(col("vec_id"), round(VecFns.cosineQ(col("qv"), qvec), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_id")).limit(k)
  }
}
