package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Vector/embedding functions (SURVEY.md §2.9).
  *
  * Design note on determinism: floating-point sums are order-dependent, so a
  * naive double dot-product need not agree bit-for-bit between Spark and the
  * DuckDB oracle (or across partitionings). We therefore quantize each
  * component to an integer grid (×1e7, stored as integral doubles). Products
  * are ≤1e14 and 64-element sums stay < 2^53, so every partial sum is an
  * exactly-representable integer and the result is identical regardless of
  * evaluation order or engine. Cosine from quantized vectors is then one
  * deterministic division — bitwise reproducible everywhere.
  *
  * (Reference computes cosine via L2-normalized matmul:
  * quran_mcp/search.py:158, quran_mcp/embeddings.py:28-37.)
  */
object VecFns {
  val Scale: Double = 1e7

  /** Quantize a float vector to an integral-double grid. */
  def quantize(c: Column): Column =
    transform(c.cast("array<double>"), x => round(x * lit(Scale)))

  /** Exact dot product of two quantized vectors (or any arrays of doubles). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two already-quantized vectors (F11). */
  def cosineQ(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine similarity of two raw float vectors. */
  def cosine(a: Column, b: Column): Column = cosineQ(quantize(a), quantize(b))

  /** F10: Chroma-style distance→similarity 1/(1+max(0,d))
    * (reference: mcp_server/apps/embeddings.py:302-311). */
  def distanceToSimilarity(d: Column): Column =
    lit(1.0) / (lit(1.0) + greatest(lit(0.0), d))

  /** E1 offline Embedder: deterministic hashed bag-of-words embedding.
    * bucket(t) = hash31(t) % dim, sign(t) = bit above — the classic hashing
    * trick (feature hashing), built only from portable md5 hashing so the
    * oracle can reproduce it. Returns an un-normalized integer-valued vector.
    */
  def hashEmbed(toks: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), d =>
      aggregate(toks, lit(0.0), (acc, t) => {
        val h = TextFns.hash31(t)
        val bucket = h % lit(dim.toLong)
        val sign = when(floor(h / lit(dim.toLong)) % lit(2L) === lit(0L), lit(1.0)).otherwise(lit(-1.0))
        acc + when(bucket === d.cast(LongType), sign).otherwise(lit(0.0))
      }))

  /** L2-normalized form of hashEmbed, rounded for stable serialization. */
  def hashEmbedNormed(toks: Column, dim: Int, roundTo: Int = 6): Column = {
    val v = hashEmbed(toks, dim)
    val n = norm2(v)
    transform(v, x => when(n > lit(0.0), round(x / n, roundTo)).otherwise(lit(0.0)))
  }
}
