package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-table build (E1 at scale): the explode/groupBy form of the
  * feature-hashing embedder — one md5 per (doc, token), shuffle keyed on
  * (doc_id, bucket) with map-side combine. This is the bulk path; the
  * scalar column form ([[graft.functions.VecFns.hashEmbed]]) serves
  * query-time single-row encodes.
  */
object Embed {

  /** Sparse hashed-embedding entries: (doc_id, bucket, v) where v is the
    * signed token count landing in the bucket (cancel-to-zero entries are
    * kept — they mark touched buckets, matching the scalar form's map). */
  def hashEmbedEntries(docs: DataFrame, idCol: String, textCol: String,
                       dim: Int): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextFns.tokens(col(textCol))).as("t"))
    val h = TextFns.hash31(col("t"))
    toks
      .select(col("doc_id"),
        (h % lit(dim.toLong)).as("bucket"),
        when(floor(h / lit(dim.toLong)).cast("long") % 2 === 0, lit(1.0))
          .otherwise(lit(-1.0)).as("s"))
      .groupBy("doc_id", "bucket")
      .agg(sum("s").as("v"))
  }

  /** Sign-random-projection dimensionality reduction over a QUANTIZED
    * embedding column: y_j = Σ_d s_{j,d}·qx_d with s ∈ {±1} drawn from
    * the shared md5 hyperplane family ([[Similarity.hyperplaneSigns]] —
    * the same matrix every engine/run regenerates from (seed, j, d), so
    * the projection needs no stored model and is exactly reproducible).
    * Achlioptas-style sign projections preserve pairwise distances in
    * expectation (the JL lemma's database-friendly form) at k ≪ dim —
    * the cheap pre-pass before clustering/ANN when 384-d is too wide.
    * Over quantized integer components the ±sums stay exact in doubles
    * (|Σ| ≤ dim·1e7 ≪ 2^53), so the DuckDB twin is bit-identical with
    * no rounding grid. Narrow per-row map: k codegen'd dot products
    * against array literals, no shuffle, no UDF. */
  def randomProject(vecQ: org.apache.spark.sql.Column, dim: Int, k: Int,
                    seed: String = "rp"): org.apache.spark.sql.Column =
    array(randomProjectCols(vecQ, dim, k, seed): _*)

  /** The k projection components of [[randomProject]] as individual
    * columns — the flat shape external checkers can sort/hash (array
    * cells defeat pandas-style comparators; see CORRECTNESS_r10
    * random_project). Same math, same sign family. */
  def randomProjectCols(vecQ: org.apache.spark.sql.Column, dim: Int, k: Int,
                        seed: String = "rp"): Seq[org.apache.spark.sql.Column] =
    (0 until k).map { j =>
      val signs = typedLit(Similarity.hyperplaneSigns(dim, j, seed))
      graft.functions.VecFns.dot(vecQ, signs).cast("long")
    }

  /** Dense embedding column from sparse entries (map lookup per slot). */
  def toDense(entries: DataFrame, dim: Int): DataFrame = {
    val m = entries.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
    m.select(col("doc_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => coalesce(element_at(col("m"), d.cast("long")), lit(0.0))).as("embedding"))
  }
}
