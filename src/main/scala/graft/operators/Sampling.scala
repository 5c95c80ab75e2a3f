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

  /** Deterministic per-group cap: keep at most `n` rows per group,
    * chosen by the seeded-md5 total order (md5(seed ":" id), id) — the
    * mix-assembly step that bounds any ONE source's dominance while the
    * selection stays reproducible on any engine (the md5-grid doctrine
    * as an ORDER, same as [[graft.operators.Shards.shuffleOrder]]); a
    * new seed redraws the kept set, nested caps are NOT subsets (unlike
    * [[sampleByHash]]'s residue classes — rank-based, not
    * threshold-based).
    *
    * Shape: one group-keyed window (shuffle + per-group sort). A
    * pathologically dominant group degrades to one task's sort — at
    * that skew compose with [[graft.operators.Dedup.topKPerGroup]]
    * (order = negated 60-bit [[hashKey]], tie = id): the bounded-heap
    * pass caps what reaches the exchange at n·P rows per group. */
  def capPerGroup(docs: DataFrame, groupCol: String, idCol: String,
                  n: Int, seed: String): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val clash = Seq("_ck", "_rn").filter(docs.columns.contains)
    require(clash.isEmpty, s"columns collide with cap working names: $clash")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("_ck"), col(idCol))
    docs
      .withColumn("_ck", md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n).drop("_ck", "_rn")
  }

  /** Curriculum export order: stratify by a long-grid score (histogram-
    * style all-integer bucket assignment over the score's own range —
    * engine-identical), then a deterministic seeded-md5 shuffle WITHIN
    * each stratum — the "order by difficulty, random inside a level"
    * layout curriculum training reads, reproducible on any engine (the
    * md5-grid doctrine as an order, same family as
    * [[graft.operators.Shards.shuffleOrder]]).
    *
    * Shape: the score projection MATERIALIZES (localCheckpoint) so the
    * bounds aggregate and the main branch read one snapshot instead of
    * re-executing an arbitrarily expensive upstream (a quality-scored
    * input would tokenize the corpus twice otherwise — the
    * percentileGlobal/shuffleOrder snapshot doctrine), then a 1-row
    * bounds broadcast + ONE stratum-keyed window. nStrata is small by
    * design, so each stratum's sort is n/nStrata rows in one task's
    * partition — at the scale where that binds, compose the two-pass
    * prefix-count machinery per stratum (shuffleOrder's shape,
    * stratum-scoped) instead. Same runtime overflow guard as
    * [[graft.operators.Profile.histogram]]'s identical bucket formula:
    * a span·nStrata past 2^63 raises instead of silently wrapping. */
  def curriculumOrder(scored: DataFrame, idCol: String, scoreCol: String,
                      nStrata: Int, seed: String): DataFrame = {
    require(nStrata >= 1, "need at least one stratum")
    val clash = Seq("_ck", "_lo", "_hi", "stratum", "pos")
      .filter(scored.columns.contains)
    require(clash.isEmpty, s"columns collide with curriculum names: $clash")
    val snap = scored.localCheckpoint()
    val b = snap.agg(min(scoreCol).as("_lo"), max(scoreCol).as("_hi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("stratum").orderBy(col("_ck"), col(idCol))
    snap.crossJoin(broadcast(b))
      .withColumn("stratum",
        when(col("_hi") - col("_lo") >= lit(Long.MaxValue / nStrata),
          raise_error(lit(s"curriculumOrder: score span * $nStrata overflows " +
            "long — rescale the score grid or lower nStrata")).cast("long"))
          .otherwise(expr(s"((`$scoreCol` - _lo) * $nStrata) div (_hi - _lo + 1)")))
      .withColumn("_ck",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_ck", "_lo", "_hi")
  }

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
    * (hash, id) order — deterministic "take k uniform docs per
    * language/source" (the corpus-balancing step before mixing).
    *
    * The naive form is one rank window partitioned by stratum — but that
    * window's SORT is unbounded: at 100 TB with a dominant stratum (60 %
    * English under a `lang` stratum) one task sorts 60 TB (round-8
    * verdict). So the window input is PRE-THINNED per stratum with a
    * hash-key threshold: keys are uniform on [0, 2^60), so keeping
    * `hk < safety·quota/n · 2^60` leaves ~safety·quota rows per stratum
    * for the rank to sort, independent of stratum size. The thinned set
    * is a downward-closed prefix of the (hk, id) sort order (every
    * dropped row sorts after every kept row), so the first
    * min(quota, n) rows are EXACTLY those of the unthinned window
    * whenever the thinned stratum still holds ≥ min(quota, n) rows — and
    * a second cheap count verifies that per stratum, routing the
    * (Chernoff-bound-rare, but across millions of strata not impossible)
    * under-filled stratum through its full rows instead. Output is
    * byte-identical to the naive window by construction.
    *
    * Cost shape: the extra passes are narrow map-side-combinable counts
    * (~3 more scans of the pruned columns) + two broadcasts of
    * #strata-row frames — traded against the unbounded hot-stratum sort,
    * the right trade at any scale where the skew exists at all. (Spark 4
    * also inserts a partial WindowGroupLimit before the exchange, which
    * caps the SHUFFLED rows at quota×mapPartitions; the pre-thinning
    * additionally bounds the map-side sort input and the scan→shuffle
    * volume itself, so the two compose rather than compete.) */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       quota: Int, safety: Double = 8.0): DataFrame = {
    val keyed = docs.withColumn("__gsp_hk", hashKey(col(idCol)))
    // per-stratum sizes: #strata rows, broadcast back onto the corpus
    val counts = keyed.groupBy(col(stratumCol)).agg(count(lit(1)).as("__gsp_n"))
    val two60 = math.pow(2.0, 60)
    val withThr = keyed.join(
      broadcast(counts.withColumn("__gsp_thr",
        least(lit(two60), lit(safety * quota) / col("__gsp_n") * lit(two60)))),
      Seq(stratumCol))
    val thinned = withThr.where(col("__gsp_hk") < col("__gsp_thr"))
    // coverage check: a stratum whose thinned slice lost rank-quota rows
    // (possible only when the Binomial(n, safety·quota/n) tail fires)
    // contributes its FULL row set — exactness never depends on luck
    val kept = thinned.groupBy(col(stratumCol)).agg(count(lit(1)).as("__gsp_kept"))
    val underfilled = counts.join(kept, Seq(stratumCol), "left")
      .where(coalesce(col("__gsp_kept"), lit(0L)) <
        least(lit(quota.toLong), col("__gsp_n")))
      .select(col(stratumCol))
    val windowInput = thinned
      .unionByName(withThr.where(col("__gsp_hk") >= col("__gsp_thr"))
        .join(broadcast(underfilled), Seq(stratumCol), "left_semi"))
      .drop("__gsp_n", "__gsp_thr")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__gsp_hk"), col(idCol))
    windowInput.withColumn("rk", row_number().over(w))
      .where(col("rk") <= quota)
      // the using-join moved stratumCol first — restore the input layout
      .select(docs.columns.map(col).toIndexedSeq: _*)
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

  /** Temperature-based source rebalancing at α = 1/2 (sqrt sampling, the
    * multilingual-corpus balancing rule): each source is down-sampled to
    * a keep rate ∝ √|source| — the biggest source keeps rate 1, a source
    * a quarter its size keeps rate 1/2 of ITS rows, flattening the
    * source distribution toward the temperature target without
    * up-sampling. Unlike [[mixSources]]' hand-set integer weights, the
    * rates are DERIVED from the data in one tiny aggregate.
    *
    * α is fixed at 1/2 on purpose: `sqrt` is correctly rounded in IEEE
    * 754 (a `pow(c, α)` for general α is not), so the per-source rate —
    * √c / √c_max, one division — and the keep threshold
    * ⌊rate · 2^60⌋ are bit-identical in any engine, and the kept set is
    * exactly reproducible (same doctrine as [[sampleByHash]]). Shape:
    * one combinable count (#sources rows) + a 1-row max attach + a
    * broadcast join of the rate table onto the corpus + a narrow hash
    * filter — no data-scale shuffle. */
  def sqrtTemperatureSample(docs: DataFrame, idCol: String,
                            sourceCol: String): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("__gst_n"))
    val rates = counts.select(col(sourceCol),
      sqrt(col("__gst_n").cast("double")).as("__gst_w"))
    val wmax = rates.agg(max(col("__gst_w")).as("__gst_wmax"))
    val rate = rates.crossJoin(broadcast(wmax))
      .select(col(sourceCol), (col("__gst_w") / col("__gst_wmax")).as("__gst_rate"))
    docs.join(broadcast(rate), Seq(sourceCol))
      .where(hashKey(col(idCol)) <
        floor(col("__gst_rate") * lit(math.pow(2.0, 60))).cast("long"))
      .withColumn("keep_rate", round(col("__gst_rate"), 6))
      .select((docs.columns.map(col) :+ col("keep_rate")).toIndexedSeq: _*)
  }

  /** Deterministic contrastive NEGATIVE sampling via a hash ring:
    * every doc gets a seeded bucket; each anchor probes `k` seeded
    * buckets and takes the per-anchor md5-min candidate (≠ itself) from
    * each — k pseudo-random negatives per anchor, reproducible on any
    * engine (pure md5-grid, no RNG state). The pair-mining step a
    * contrastive/embedding training recipe needs at corpus scale.
    *
    * Shape — the whole point vs the naive draw: "k random non-self
    * docs per anchor" as a sampled cross join is anchors×corpus; here
    * candidates meet in a BUCKET equi-join (|anchors|·k·(corpus/
    * nBuckets) joined rows) and the per-(anchor, probe) min is one
    * window over those — pick nBuckets ∝ corpus/targetBucketSize and
    * the cost is linear with a bounded constant. Caveats, by
    * construction: an empty probed bucket yields no row for that
    * (anchor, j), and two probes of one anchor can land in the same
    * bucket and repeat a negative — callers needing exactly-k distinct
    * draw with a larger k and dedupe. Negatives are uniform over the
    * ring, NOT hardness-mined; compose with
    * [[graft.operators.Similarity.knnJoinBucketed]] minus
    * near-duplicates for hard negatives. */
  def negativePairs(docs: DataFrame, idCol: String, k: Int, nBuckets: Int,
                    seed: String): DataFrame = {
    require(k > 0 && nBuckets > 0, "k and nBuckets must be positive")
    // ids hash THROUGH their string form (any id type works — a long
    // cast would null out string ids and silently return zero pairs,
    // the sibling operators' any-type contract); null ids never
    // equi-join, so they yield no pairs on either side, like left_anti
    val b = docs.select(col(idCol).as("cand"),
      (hashKey(concat(lit(s"$seed:b:"), col(idCol).cast("string"))) % nBuckets).as("bkt"))
    val p = docs.select(col(idCol).as("anchor"))
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("pbkt", hashKey(concat(lit(s"$seed:p:"),
        col("anchor").cast("string"), lit(":"), col("j").cast("string"))) % nBuckets)
    val c = p.join(b, col("pbkt") === col("bkt"))
      .where(col("cand") =!= col("anchor"))
      .withColumn("hr", hashKey(concat(lit(s"$seed:r:"),
        col("anchor").cast("string"), lit(":"), col("cand").cast("string"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor", "j").orderBy(col("hr"), col("cand"))
    c.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("anchor"), col("j").cast("int").as("j"),
        col("cand").as("negative"))
  }
}
