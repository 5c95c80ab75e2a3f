package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split / mixing operators for training-data
  * pipelines (builder brief). Everything keys off a 60-bit md5-derived
  * hash of the document id — NOT `rand()` — so results are reproducible
  * across runs, engines (the DuckDB oracle computes the identical key),
  * partitionings, and retries of failed tasks; at 100 TB a rand()-based
  * sample silently changes under speculative execution, a hash-based one
  * cannot. The same doctrine as the reference's content-checksum
  * idempotence (scripts/incremental_embedder.py:96-118), applied to
  * sampling.
  */
object Sampling {

  /** 60-bit uniform sampling key: first 15 hex chars of md5(id). The
    * DuckDB twin is `('0x'||substring(md5(id::VARCHAR),1,15))::BIGINT`
    * (Oracles.h60). 60 bits keeps the value positive in a signed long,
    * so `% den` needs no pmod. */
  def hashKey(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Bernoulli-style deterministic sample: keep a row iff its hash key
    * lands in the first `num` of `den` residue classes — an exact-rate,
    * reproducible subsample that composes with itself (num=3,den=10 is a
    * superset of num=2,den=10: nested samples for scaling-law runs).
    * Pure narrow filter — pushes into the scan, no shuffle, no state. */
  def sampleByHash(docs: DataFrame, idCol: String, num: Int, den: Int): DataFrame =
    docs.where(hashKey(col(idCol)) % den < num)

  /** Deterministic train/val/test split assignment: hash-bucket each id
    * into 100 cells, carve [0,trainPct) / [trainPct,trainPct+valPct) /
    * rest. One narrow projection; the split column then drives
    * partitioned writes or per-split filters that prune at the scan. */
  def assignSplits(docs: DataFrame, idCol: String,
                   trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val cell = hashKey(col(idCol)) % 100
    docs.withColumn("split",
      when(cell < trainPct, lit("train"))
        .when(cell < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Stratified fixed-quota sample: the first `quota` rows per stratum in
    * hash order — deterministic "take k uniform docs per language/source"
    * (the corpus-balancing step before mixing). The window shuffles once
    * on the stratum key; with thousands of strata at 100 TB each
    * partition holds only its stratum's rows and the rank short-circuits
    * at `quota`. A skewed stratum is bounded by the quota on output, and
    * the rank needs no global sort — never a single-partition window
    * (the anti-pattern [[Shards.packShards]] documents). */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(hashKey(col(idCol)), col(idCol))
    docs.withColumn("rk", row_number().over(w)).where(col("rk") <= quota).drop("rk")
  }

  /** Source-weighted mixing: repeat each document `weight(source)` times
    * with an `epoch` column (1..w) — the integer-upsampling step that
    * turns per-source mixture weights into a physical training corpus
    * (LLaMA/Pile-style data mixing). Sources absent from `weights` (or
    * weighted 0) drop out. The weight lookup is a literal map in the
    * plan (no join — there are dozens of sources, not millions) and the
    * explode is narrow: output size is exactly Σ w(s)·|s|, no shuffle.
    * Downstream shuffles (e.g. [[Shards.packShards]]'s two-pass pack)
    * spread the replicas, so hot sources don't pin a partition. */
  def mixSources(docs: DataFrame, sourceCol: String,
                 weights: Map[String, Int]): DataFrame = {
    val wmap = typedLit(weights)
    val w = element_at(wmap, col(sourceCol))
    docs.withColumn("w", w).where(col("w").isNotNull && col("w") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("w"))))
      .drop("w")
  }
}
