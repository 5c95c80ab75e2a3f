package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (builder brief): quality scoring, language-ID heuristic, token counting,
  * document fingerprinting. All are single-pass narrow column expressions —
  * no shuffle, embarrassingly parallel at any corpus size.
  */
object TextAnalysis {

  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "in",
    "on", "to", "is", "are", "was", "it", "this", "that", "for", "with", "as",
    "at", "by")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht",
    "mit", "ein", "im", "den", "von", "zu")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "et", "est", "pas",
    "des", "une", "dans", "du", "pour")
  val StopwordsEs: Seq[String] = Seq("el", "los", "las", "es", "no",
    "una", "en", "del", "por", "para", "con")

  /** Quality stats per document: token counts, type-token ratio, stopword
    * ratio, mean token length (quality-scoring heuristics per brief). */
  def qualityStats(docs: DataFrame, idCol: String, textCol: String,
                   passThrough: Seq[String] = Nil): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val nTok = size(toks)
    val nUniq = size(array_distinct(toks))
    val nStop = size(filter(toks, t => array_contains(typedLit(StopwordsEn), t)))
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    docs.select(Seq(
      col(idCol).cast("long").as("doc_id"),
      length(col(textCol)).cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      nUniq.cast("long").as("n_uniq"),
      when(nTok > 0, round(nUniq.cast("double") / nTok, 6)).otherwise(lit(0.0)).as("ttr"),
      when(nTok > 0, round(nStop.cast("double") / nTok, 6)).otherwise(lit(0.0)).as("stop_ratio"),
      when(nTok > 0, round(sumLen.cast("double") / nTok, 6)).otherwise(lit(0.0)).as("mean_tok_len")) ++
      passThrough.map(col): _*)
  }

  /** The UNROUNDED composite quality signal over [[qualityStats]]'
    * rounded inputs: 0.5·stop_ratio + 0.3·ttr +
    * 0.2·min(mean_tok_len/10, 1) — ONE weight definition shared by
    * every consumer ([[qScore6]]'s round-half grid for the
    * cut/rollup queries; curriculum_order's floor-micro grid, which
    * must NOT round-half: the composite can sit exactly on the 1e-6
    * half boundary, where engines disagree — caught at sf0.1). A
    * weight tweak edits exactly two sites: here and the oracle
    * strings. */
  def qComposite(stopRatio: Column, ttr: Column, meanTokLen: Column): Column =
    stopRatio * 0.5 + ttr * 0.3 + least(meanTokLen / 10.0, lit(1.0)) * 0.2

  /** [[qComposite]] on the 1e-6 round-half grid (the historical form
    * the cut/rollup oracles mirror). */
  def qScore6(stopRatio: Column, ttr: Column, meanTokLen: Column): Column =
    round(qComposite(stopRatio, ttr, meanTokLen), 6)

  /** Per-stratum quality-percentile cut — the thresholding step a
    * training pipeline runs after scoring ("keep the top keepTop
    * fraction of each language by quality"). The composite signal
    * weighs the C4-ish stats (stopword density, lexical diversity,
    * bounded mean token length); the cut is percent_rank over
    * (stratum, signal) with doc_id as the total-order tie-break, so
    * the kept set is EXACTLY reproducible (rank arithmetic is integer
    * ratios — no float-threshold drift between engines). Scale shape:
    * one shuffle on the stratum key + per-stratum sort; strata are
    * bounded (languages × source shards). For unbounded strata compute
    * approx thresholds instead (approx_percentile over the signal) and
    * broadcast-join them — the exact window form IS the oracle. */
  def qualityPercentile(docs: DataFrame, idCol: String, textCol: String,
                        stratumCol: String, minRank: Double = 0.9): DataFrame = {
    val s = qualityStats(docs, idCol, textCol, Seq(stratumCol))
    val score = qScore6(col("stop_ratio"), col("ttr"), col("mean_tok_len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("q_score"), col("doc_id"))
    // the threshold is taken as ONE literal (minRank), never derived by
    // arithmetic (1.0-0.1 and a literal 0.9 are different doubles — a
    // derived threshold can disagree with an oracle's literal at an
    // exact rank boundary)
    s.withColumn("q_score", score)
      .withColumn("pr", percent_rank().over(w))
      .where(col("pr") >= minRank)
      .select(col("doc_id"), col(stratumCol), col("q_score"),
        round(col("pr"), 6).as("pr"))
  }

  /** The unbounded-strata scale path for [[qualityPercentile]]: instead
    * of a per-stratum SORT (a straggler when one stratum holds most of
    * the corpus), compute each stratum's approximate score threshold in
    * one pass (`approx_percentile`, map-side combinable t-digest) and
    * broadcast-join the tiny per-stratum threshold table back — the cut
    * is then a narrow filter. Not oracle-matchable (the t-digest is
    * Spark-specific); its kept set is pinned against the exact form in
    * TextAnalysisSpec within the sketch's rank tolerance. */
  def qualityPercentileApprox(docs: DataFrame, idCol: String, textCol: String,
                              stratumCol: String, minRank: Double = 0.9,
                              accuracy: Int = 10000): DataFrame = {
    val s = qualityStats(docs, idCol, textCol, Seq(stratumCol))
      .withColumn("q_score",
        qScore6(col("stop_ratio"), col("ttr"), col("mean_tok_len")))
    val thresholds = s.groupBy(col(stratumCol))
      .agg(percentile_approx(col("q_score"), lit(minRank), lit(accuracy)).as("q_min"))
    s.join(broadcast(thresholds), stratumCol)
      .where(col("q_score") >= col("q_min"))
      .select(col("doc_id"), col(stratumCol), col("q_score"))
  }

  /** Language-ID heuristic (brief: n-gram/stopword heuristic): script
    * detection for Arabic/CJK, distinct-stopword votes for latin languages,
    * deterministic tie-break order en > de > fr > es. Script counts come
    * from ONE [[graft.plans.ScriptCounts]] scan (the regex-diff form paid
    * eight regex passes per row; values identical). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sc = graft.plans.ScriptCounts(col(textCol))
    val (nAr, nCjk, nLatin) =
      (sc.getField("n_ar"), sc.getField("n_cjk"), sc.getField("n_latin"))
    val nAlpha = nAr + nCjk + nLatin
    def ratio(nBlock: Column): Column =
      when(nAlpha > 0, nBlock.cast("double") / nAlpha).otherwise(lit(0.0))
    val toks = TextFns.distinctTokens(col(textCol))
    def votes(sw: Seq[String]): Column = size(array_intersect(toks, typedLit(sw)))
    val (vEn, vDe, vFr, vEs) = (votes(StopwordsEn), votes(StopwordsDe),
      votes(StopwordsFr), votes(StopwordsEs))
    val guess =
      when(ratio(nAr) > 0.5, lit("ar"))
        .when(ratio(nCjk) > 0.3, lit("zh"))
        .when(vEn >= vDe && vEn >= vFr && vEn >= vEs, lit("en"))
        .when(vDe >= vFr && vDe >= vEs, lit("de"))
        .when(vFr >= vEs, lit("fr"))
        .otherwise(lit("es"))
    docs.select(col(idCol).cast("long").as("doc_id"), guess.as("lang_guess"))
  }

  /** Token counting (brief): whitespace tokens + a BPE-ish regex count
    * (letter runs / digit runs / single non-alnum symbols). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(filter(split(col(textCol), "\\s+"), t => length(t) > 0)).cast("long").as("n_ws"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_sub"))

  /** CCNet-style language-model perplexity quality signal (Wenzek et al.
    * 2020, arXiv:1911.00359 filter by LM perplexity; the production
    * pipelines score against a pretrained KenLM — zero-egress here, so
    * the LM is the corpus's own add-one-smoothed UNIGRAM model, the
    * deterministic stand-in with the same plan shape). Per token:
    * p(t) = (cf(t)+1)/(T+V) over corpus totals; per doc:
    * ppl = exp(-mean log p). Determinism doctrine (see VecFns): each
    * token's log-prob is quantized to an integer 1e-6 grid BEFORE the
    * per-doc sum, so partial sums are exact integers and the result is
    * order/partitioning-independent (a raw double sum need not match
    * the oracle bit-for-bit at hash granularity).
    *
    * Scale shape: one postings-style explode/groupBy (map-side
    * combinable), a dictionary join AQE broadcasts while small (and
    * shuffles on term past the threshold — the full vocabulary must
    * never be FORCED onto the driver), and a per-doc aggregation —
    * the BM25 plan shape, no new shuffle class. */
  def lmPerplexity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val post = Postings.build(
      docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text")),
      "doc_id", "text")
    val dict = post.groupBy("term").agg(sum("tf").as("cf"))
    val totals = dict.agg(sum("cf").as("tt"), count("*").as("vv"))
    // quantized token log-prob: integral double on the 1e-6 grid. FLOOR,
    // not round: round-to-nearest puts the decision boundary at .5,
    // where Spark (BigDecimal of the double's shortest string repr) and
    // C++ engines (std::round of the double) can disagree on the SAME
    // value — one vocabulary term flipping by 1 micro-unit shifts every
    // containing doc's sw (seen at sf0.1). floor's boundary is an
    // integer, which only a genuine cross-engine ln() divergence can
    // straddle — ulp-rare instead of shortest-repr-common.
    val lp = floor(log((col("cf") + lit(1.0)) /
      (col("tt") + col("vv"))) * lit(1e6))
    // no broadcast HINT on the dictionary: it is the FULL vocabulary,
    // unbounded at corpus scale (a forced broadcast would OOM the
    // driver at 100 TB). AQE still auto-broadcasts it when it measures
    // small; past the threshold this becomes the term-keyed shuffle
    // join the postings already paid for. The totals crossJoin stays a
    // 1-row broadcast.
    val scored = post.join(dict, "term").crossJoin(broadcast(totals))
      .select(col("doc_id"), col("dl"), (col("tf") * lp).as("w"))
      .groupBy("doc_id", "dl").agg(sum("w").as("sw"))
    // per-token average STAYS on the integer micro grid: sw is integral
    // micro-logprob, so sw/1e6/dl has 7th-decimal digits and lands
    // EXACTLY on the round-6 half boundary whenever sw ≡ 5·dl (mod
    // 10·dl) — a value round-half can never make cross-engine stable
    // (seen at sf0.1: doc with dl=10, sw ending in …55). Floor-divide
    // the micro units by dl instead — on NEGATED (positive) operands,
    // because Spark's `div` truncates toward zero while DuckDB's `//`
    // floors, and the two agree only for non-negative inputs — and
    // never call round on the quotient. ppl then exponentiates that
    // exact grid point (identical double on both engines; exp's true
    // value is never ON the grid — transcendental — so its round is
    // ulp-stable).
    val neg6 = expr("(0 - CAST(sw AS BIGINT)) div dl")
    scored.select(col("doc_id"), col("dl").cast("long").as("n_tokens"),
        (-neg6.cast("double") / 1e6).as("avg_logprob"),
        round(exp(neg6.cast("double") / 1e6), 6).as("ppl"))
      .orderBy("doc_id")
  }

  /** Order-sensitive rolling document fingerprint (brief). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      TextFns.fingerprint(TextFns.tokens(col(textCol))).as("fp"))

  /** Thresholds for [[qualityFilter]]'s rule cascade. Defaults are tuned
    * to the synthetic documents fixture (C4/Gopher-style shape: token
    * bounds, mean-token-length band, stopword floor, repetition floor). */
  final case class QualityThresholds(
      minTokens: Long = 20, maxTokens: Long = 90,
      minMeanTokLen: Double = 3.0, maxMeanTokLen: Double = 10.0,
      minStopRatio: Double = 0.02, minTtr: Double = 0.35)

  /** Quality-filter cascade: every document with its keep/reject verdict
    * and the explicit rule names that rejected it — the filter sweep a
    * training corpus runs before tokenization (C4's length/symbol rules,
    * Gopher's stopword + repetition rules). One narrow single-pass
    * projection: all five rules read the same per-row token stats (shared
    * subexpressions under whole-stage codegen), so at 100 TB this is a
    * pure map over the corpus scan — no shuffle, no second pass. The
    * stopword floor only applies to latin-dominant rows (an Arabic doc
    * has no English stopwords to find — the gate mirrors Gopher's
    * per-language application), script counts from the same
    * [[graft.plans.ScriptCounts]] scan [[langId]] uses.
    * Reason order is fixed (short, long, token-len, stopword, ttr) so
    * the rendered `reasons` string is deterministic. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
                    th: QualityThresholds = QualityThresholds()): DataFrame = {
    val nTok = size(TextFns.tokens(col(textCol))).cast("long")
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      nTok.as("n_tokens"),
      filterReasons(col(textCol), th).as("reasons"))
      .withColumn("kept", col("reasons") === "")
  }

  /** The filter cascade's `reasons` column (shared between
    * [[qualityFilter]] and [[sourceQualityRollup]]): the fired rule
    * subset in fixed order, '' = kept. Rules test the UNROUNDED ratios. */
  private def filterReasons(text: Column, th: QualityThresholds): Column = {
    val toks = TextFns.tokens(text)
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks))
    val nStop = size(filter(toks, t => array_contains(typedLit(StopwordsEn), t)))
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val ttr = nUniq.cast("double") / nTok
    val stopRatio = nStop.cast("double") / nTok
    val meanLen = sumLen.cast("double") / nTok
    val sc = graft.plans.ScriptCounts(text)
    val nAlpha = sc.getField("n_ar") + sc.getField("n_cjk") + sc.getField("n_latin")
    val latinDominant = sc.getField("n_latin") * 2 > nAlpha
    val rules: Seq[(String, Column)] = Seq(
      "too_short" -> (nTok < th.minTokens),
      "too_long" -> (nTok > th.maxTokens),
      // stats rules fire only on non-empty docs: an empty doc is fully
      // described by too_short, not by 0-valued ratios
      "odd_token_len" -> (nTok > 0 &&
        (meanLen < th.minMeanTokLen || meanLen > th.maxMeanTokLen)),
      "low_stopword" -> (nTok > 0 && latinDominant && stopRatio < th.minStopRatio),
      "repetitive" -> (nTok > 0 && ttr < th.minTtr))
    // concat_ws drops NULL branches, so the string is the fired subset
    // in fixed rule order ('' = kept)
    concat_ws(",", rules.map { case (name, cond) => when(cond, lit(name)) }: _*)
  }

  /** Source-level quality rollup — the domain-filtering step of a web
    * pipeline (drop whole hosts whose documents are mostly junk, rather
    * than paying per-document inspection downstream): per source, the
    * doc count, how many pass the [[qualityFilter]] cascade, the kept
    * fraction, the mean composite quality signal (same signal as
    * [[qualityPercentile]]), and the keep/drop decision at
    * `minKeptFrac`. ONE narrow pass computes every per-doc signal
    * (no join between the stats and filter legs) followed by ONE
    * combinable aggregation on the source key — the mean rides an
    * integer 1e-6 grid (`sum_q6`) so it is order-independent and
    * engine-exact; sources are bounded (hosts/shards), the output is
    * tiny. */
  def sourceQualityRollup(docs: DataFrame, idCol: String, textCol: String,
                          sourceCol: String,
                          th: QualityThresholds = QualityThresholds(),
                          minKeptFrac: Double = 0.5): DataFrame = {
    // compose the existing single-pass pieces — qualityStats' rounded
    // grid, the shared q-score, the shared cascade — as stacked
    // projections over one scan (Catalyst collapses them; no join)
    val s = qualityStats(docs, idCol, textCol, Seq(sourceCol, textCol))
    val perDoc = s.select(
      col(sourceCol).as("source"),
      round(qScore6(col("stop_ratio"), col("ttr"), col("mean_tok_len")) * 1e6)
        .cast("long").as("q6"),
      (filterReasons(col(textCol), th) === "").cast("long").as("kept"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("kept").as("n_kept"),
        sum("q6").as("sum_q6"))
      // grid outputs with NO round-half call anywhere: a ratio of grid
      // integers can land exactly on the round-6 half boundary, where
      // Spark (BigDecimal of shortest repr) and C++ engines
      // (std::round) disagree on the same double (sum≡125 mod 250
      // flipped mean_q at sf0.1). mean_q floors on the integer grid
      // (div ≡ // for non-negatives); kept_frac floors the double
      // ratio (floor is a pure function of the identical double — no
      // algorithmic variance); keep_source compares the RAW ratio (the
      // division is deterministic, >= is exact)
      .select(col("source"), col("n_docs"), col("n_kept"),
        (floor(col("n_kept").cast("double") / col("n_docs") * 1e6) / 1e6)
          .as("kept_frac"),
        (expr("sum_q6 div n_docs").cast("double") / 1e6).as("mean_q"),
        (col("n_kept").cast("double") / col("n_docs") >= minKeptFrac)
          .as("keep_source"))
  }

  /** Token-length histogram at a fixed bucket width — the batch-shape
    * planning signal a training exporter reads before choosing sequence
    * lengths and packing factors (what fraction of the corpus fits 512
    * tokens, how heavy is the long tail). Integer bucket arithmetic
    * (`div`), one combinable aggregation, output bounded by
    * maxDocLen/width. */
  def lengthBuckets(docs: DataFrame, textCol: String,
                    bucketWidth: Int = 64): DataFrame =
    docs.select(size(TextFns.tokens(col(textCol))).cast("long").as("n_tokens"))
      .select(expr(s"n_tokens div $bucketWidth").as("len_bucket"), col("n_tokens"))
      .groupBy("len_bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        min("n_tokens").as("min_tokens"), max("n_tokens").as("max_tokens"))

  /** Gopher-style n-gram repetition stats: per document, the total
    * n-gram count, the most frequent n-gram's count, and its fraction —
    * the repetition signal TTR can miss (a doc alternating two phrases
    * has healthy TTR but a dominant bigram). Documents with fewer than
    * `n` tokens emit no row (they have no n-grams; [[qualityFilter]]'s
    * length rules own that regime). Shape: one map-side-combinable
    * count per (doc, gram), then a per-doc max/sum — two shuffles keyed
    * by doc id, no window, no driver loop. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextFns.shingles(TextFns.tokens(col(textCol)), n)).as("g"))
      .groupBy("doc_id", "g").agg(count("*").as("c"))
      .groupBy("doc_id").agg(sum("c").as("n_grams"), max("c").as("top_count"))
      .withColumn("top_frac",
        round(col("top_count").cast("double") / col("n_grams"), 6))

  /** Corpus-level boilerplate phrase mining: each distinct word n-gram's
    * DOCUMENT frequency, filtered to phrases in ≥ minDf docs — the
    * cross-document complement of [[repetitionStats]] (intra-doc). High-df
    * phrases are boilerplate templates (headers, disclaimers, navigation
    * chrome) that quality pipelines strip and shingle-dedup treats as
    * stop-shingles (cf. the maxDf hot-shingle cap in
    * Dedup.ngramJaccardPairsSharedShingle — this operator is that cap's
    * audit face). Shape: explode of per-doc DISTINCT shingles (bounded by
    * doc length), one map-side-combinable count on the gram key — the
    * same plan as the term dictionary, scale-safe at any corpus size;
    * minDf keeps the result bounded (boilerplate is rare by definition). */
  def boilerplateNgrams(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minDf: Long = 5): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(TextFns.shingles(TextFns.tokens(col(textCol)), n))).as("ngram"))
      .groupBy("ngram").agg(count("*").as("df"))
      .where(col("df") >= minDf)

  /** Boilerplate STRIPPING — closes the [[boilerplateNgrams]] loop the
    * way the C4 pipeline does (mine boilerplate, then remove it): every
    * occurrence of a mined n-gram is deleted from each document's token
    * stream. A token is dropped when ANY mined n-gram occurrence covers
    * it (overlapping occurrences union), so repeated templates vanish
    * wholesale and no partial fragments survive. `text_clean` is the
    * surviving token stream joined by single spaces — the tokenized
    * render downstream quality ops ([[qualityStats]]/[[qualityFilter]])
    * consume, not the original byte text.
    *
    * Scale shape: the mined set is bounded by construction
    * (df ≥ minDf ⇒ ≤ total-shingles/minDf entries — boilerplate is rare
    * by definition), so it collapses to ONE array row attached by a
    * 1-row broadcast crossJoin (the corpus-stats attach pattern) and the
    * per-token membership test runs as a narrow map over the docs —
    * no shuffle on the data-scale side, one combinable-count shuffle in
    * the mining pass. A mined set too large for one driver row means
    * minDf is set below any meaningful notion of "boilerplate". */
  /** Mined sets up to this size take the narrow single-pass path (one
    * per-row `array_intersect` hash sweep, no join on the doc side);
    * larger sets switch to the broadcast-join path, whose membership
    * hash builds once per TASK instead of once per row. Real-corpus
    * boilerplate with a meaningful minDf is far below this; synthetic
    * small-vocabulary corpora blow past it. */
  val DenseSetMax: Long = 2048

  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, minDf: Long = 5,
                       denseSetMax: Long = DenseSetMax): DataFrame = {
    // ONE evaluation of the mining plan, snapshotted cluster-side
    // (localCheckpoint, the Dedup snapshot discipline): the path
    // decision counts the snapshot, the dense path collects it, and the
    // join path re-reads it — never a second mining pass, and no
    // CacheManager mark to leak (the old `.cache()` pinned one
    // block-manager entry per invocation forever; snapshot storage is
    // released by the ContextCleaner once the result frame is dropped).
    val mined = boilerplateNgrams(docs, idCol, textCol, n, minDf)
      .localCheckpoint(true)
    val nMined = mined.count()
    val toksDf = spreadDocs(docs, idCol, textCol)
      .select(col("doc_id"), TextFns.tokens(col("gtext")).as("toks"))
      .select(col("doc_id"), col("toks"), TextFns.shingles(col("toks"), n).as("sh"))

    if (nMined <= denseSetMax) {
      // NARROW path: the mined set rides in as a 1-row broadcast array;
      // membership is ONE array_intersect hash sweep per row
      // (O(|doc| + |bl|)) — never an O(|bl|) array scan per POSITION
      // (that form timed out >300 s against a 26k set at sf0.1). The
      // per-position test then probes only the doc's own hit grams.
      import docs.sparkSession.implicits._
      val blSet = broadcast(Seq(
        mined.select("ngram").collect().map(_.getString(0)).sorted.toSeq).toDF("bl"))
      val staged = toksDf.crossJoin(blSet)
        .select(col("doc_id"), col("toks"), col("sh"),
          array_intersect(col("sh"), col("bl")).as("hitg"))
      // 1-based start positions whose n-gram (sh(j) IS the mined shape)
      // hit the set; empty hitg short-circuits, and hitg non-empty
      // implies size(toks) >= n so the sequence is never descending
      val starts = when(size(col("hitg")) > 0,
          filter(sequence(lit(1), size(col("toks")) - (n - 1)),
            j => array_contains(col("hitg"), element_at(col("sh"), j))))
        .otherwise(array().cast("array<int>"))
      val covered = array_distinct(flatten(
        transform(starts, j => sequence(j, j + (n - 1)))))
      rebuild(staged.select(col("doc_id"), col("toks"), covered.as("covered")))
    } else {
      // JOIN path (large mined sets): positions explode once, membership
      // is a hash join against the mined set, and only HIT positions
      // shuffle (grouped per doc) before rejoining the token stream.
      // NO forced broadcast hint: the mined set is unbounded above
      // denseSetMax (that is why this path exists), so a forced
      // broadcast would OOM the driver exactly when this branch is
      // chosen at scale — AQE sees the checkpointed side's runtime size
      // and picks broadcast-hash itself whenever it actually fits.
      val hits = toksDf.select(col("doc_id"), posexplode(col("sh")).as(Seq("p0", "gram")))
        .join(mined.select(col("ngram").as("gram")), "gram")
        .select(col("doc_id"), (col("p0") + 1).as("start"))
      val covered = hits
        .select(col("doc_id"), explode(sequence(col("start"), col("start") + (n - 1))).as("cov"))
        .groupBy("doc_id").agg(sort_array(collect_set("cov")).as("covered"))
      rebuild(toksDf.join(covered, Seq("doc_id"), "left")
        .select(col("doc_id"), col("toks"),
          coalesce(col("covered"), array().cast("array<int>")).as("covered")))
    }
  }

  /** The per-row CPU-bound strip stages need cluster-width parallelism,
    * but a single-file corpus scan arrives as ONE partition (observed:
    * 72 s single-core at sf0.1) — spread (id, text) round-robin first.
    * Shared preamble of [[stripBoilerplate]] and [[stripRepeats]]. */
  private def spreadDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val width = docs.sparkSession.sparkContext.defaultParallelism
    val src0 = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("gtext"))
    if (src0.rdd.getNumPartitions < width) src0.repartition(width) else src0
  }

  /** INTRA-document repeated-span removal — the within-doc complement of
    * [[stripBoilerplate]] (cross-doc) and the strip-side twin of
    * [[repetitionStats]] (signal-only): every n-gram occurrence AFTER the
    * first within the same document is deleted, overlapping occurrences
    * union (the "repeated substring" pathology of generated/templated
    * text — a doc alternating two phrases keeps one of each). A token
    * survives iff no repeated n-gram occurrence covers it; the first
    * occurrence of each n-gram always survives intact unless a DIFFERENT
    * repeated gram covers it.
    *
    * Scale shape: posexplode of the shingle stream, ONE combinable
    * per-(doc, gram) position-list aggregate (bounded by doc length),
    * per-doc covered-set aggregate, and a co-keyed join back to the token
    * row — three doc-keyed shuffles, no window, no driver state, no
    * corpus-wide structure (contrast stripBoilerplate's global mined
    * set). The rebuild is the same narrow membership sweep. */
  def stripRepeats(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val toksDf = spreadDocs(docs, idCol, textCol)
      .select(col("doc_id"), TextFns.tokens(col("gtext")).as("toks"))
    val grams = toksDf
      .select(col("doc_id"), posexplode(TextFns.shingles(col("toks"), n)))
      .toDF("doc_id", "p0", "g")
    // all occurrences after the first, per (doc, gram): sorted position
    // list, drop the head — 0-based p0 becomes the 1-based start j=p0+1
    val dupStarts = grams.groupBy(col("doc_id"), col("g"))
      .agg(sort_array(collect_list(col("p0"))).as("ps"))
      .where(size(col("ps")) > 1)
      .select(col("doc_id"),
        explode(slice(col("ps"), lit(2), greatest(size(col("ps")) - 1, lit(0)))).as("p0"))
    val covered = dupStarts
      .select(col("doc_id"), explode(sequence(col("p0") + 1, col("p0") + n)).as("ci"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("ci"))).as("covered"))
    val staged = toksDf.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("covered"), array().cast("array<int>")).as("covered"))
    rebuild(staged)
  }

  /** CROSS-document exact-substring dedup — the "remove all but one
    * copy" policy of suffix-array training-data dedup (Lee et al. 2022,
    * *Deduplicating Training Data Makes Language Models Better*), here
    * on the n-gram grid the rest of the dedup spine shares: every
    * n-token span appearing in MORE THAN ONE document is deleted from
    * every document EXCEPT the lowest-doc_id holder (the canonical
    * copy), overlapping removals union, and the surviving tokens
    * re-render. [[Dedup.dupSpanStats]] is this operator's signal-only
    * twin (same grammar, same coverage arithmetic — it counts what this
    * removes); [[stripRepeats]] handles the WITHIN-doc repeats this
    * deliberately leaves alone, and [[stripBoilerplate]] strips by a
    * mined phrase set rather than pairwise duplication.
    *
    * Scale shape: one shuffle keyed on the n-gram for a min/max
    * aggregate — cross-doc duplication is `min(doc_id) != max(doc_id)`,
    * both partial-aggregatable, so NO countDistinct, no per-gram doc
    * list, nothing all-pairs — then a hash join back to occurrences in
    * which only STRIPPED positions shuffle per doc, and the rebuild's
    * doc-keyed join. The canonical-copy rule needs no tie-break: min is
    * total over doc ids. */
  def stripCrossDups(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 5): DataFrame = {
    require(n >= 2, "span length must be >= 2")
    val toksDf = spreadDocs(docs, idCol, textCol)
      .select(col("doc_id"), TextFns.tokens(col("gtext")).as("toks"))
    val oc = toksDf
      .select(col("doc_id"), posexplode(TextFns.shingles(col("toks"), n)))
      .toDF("doc_id", "p0", "g")
    val keep = oc.groupBy("g")
      .agg(min("doc_id").as("keep_doc"), max("doc_id").as("max_doc"))
      .where(col("keep_doc") =!= col("max_doc"))
      .select("g", "keep_doc")
    val covered = oc.join(keep, "g")
      .where(col("doc_id") =!= col("keep_doc"))
      .select(col("doc_id"),
        explode(sequence(col("p0") + 1, col("p0") + n)).as("ci"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("ci"))).as("covered"))
    rebuild(toksDf.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("covered"), array().cast("array<int>")).as("covered")))
  }

  /** Shared rebuild stage: drop covered positions, render the surviving
    * token stream. Input: (doc_id, toks, covered 1-based positions). */
  private def rebuild(staged: DataFrame): DataFrame =
    staged.select(col("doc_id"),
      concat_ws(" ", filter(col("toks"),
        (_, i) => !array_contains(col("covered"), i + 1))).as("text_clean"),
      size(col("toks")).cast("long").as("n_tokens"),
      size(col("covered")).cast("long").as("n_stripped"))

  /** PII patterns, ordered. Kept to syntax with identical semantics in
    * Java regex (Spark) and RE2 (the DuckDB oracle): character classes,
    * bounded repetition, `\b` word boundaries — no lookaround, no
    * backreferences. Order matters for [[redactPii]]: SSN before PHONE
    * (the digit-dash SSN shape is also a valid phone match) and IP
    * before PHONE (kill dotted digit runs first).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ip" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\+\\d[\\d\\- ]{7,14}\\d")

  /** Per-document PII hit counts, one column per [[PiiPatterns]] type —
    * the detection sweep run before a corpus ships (count, sample,
    * route to redaction). Counts are non-overlapping leftmost matches in
    * both engines. Single-pass narrow projection; each regex is one
    * codegen'd `RegExpCount` over the row. */
  def piiStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id") +:
      PiiPatterns.map { case (name, pat) =>
        regexp_count(col(textCol), lit(pat)).cast("long").as(s"n_$name")
      }: _*)

  /** PII redaction: each pattern class replaced by its `<TYPE>` tag, in
    * [[PiiPatterns]] order (order is part of the contract — see the
    * pattern doc). Chained `regexp_replace` stays a narrow codegen'd
    * projection: at 100 TB this is a pure map over the corpus scan. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, lit(pat), lit(s"<${name.toUpperCase}>"))
    }

  /** Benchmark decontamination: (corpus doc, benchmark doc, #shared
    * distinct n-gram shingles) for every pair sharing at least
    * `minOverlap` — the eval-set-leakage sweep every training-data
    * pipeline runs before a corpus ships. Shape: both sides explode to
    * distinct shingles and meet in an equi-join on the shingle; the
    * BENCHMARK side is the small one by construction (an eval set, not a
    * corpus), so Catalyst broadcasts it and the corpus side streams — at
    * 100 TB the scan stays single-pass with no corpus×bench blowup, and
    * the per-(doc,bench) count is a map-side-combinable aggregate. */
  def contaminationPairs(corpus: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchIdCol: String, benchTextCol: String,
                         n: Int, minOverlap: Int): DataFrame = {
    def shingleRows(df: DataFrame, id: String, text: String, out: String) = df
      .select(col(id).cast("long").as(out),
        explode(array_distinct(TextFns.shingles(TextFns.tokens(col(text)), n))).as("sh"))
    val c = shingleRows(corpus, idCol, textCol, "doc_id")
    val b = shingleRows(bench, benchIdCol, benchTextCol, "bench_id")
    c.join(broadcast(b), "sh")
      .groupBy("doc_id", "bench_id").agg(count("*").as("n_shared"))
      .where(col("n_shared") >= minOverlap)
  }

  /** Per-source top-k distinguishing terms by TF·IDF — the corpus
    * fingerprint report ("what is each source actually about") every
    * mixing decision reads. Scoring stays on the exact integer grid:
    * `score = cf_src · floor(ln(n_docs/df)·1e6)` — term frequency within
    * the source times the micro-quantized IDF (floor per the library's
    * transcendental doctrine; n_docs ≥ df so ln ≥ 0 and ln(1)=0 exactly,
    * no negative-operand hazard), so rank and ties are engine-identical.
    *
    * Shape: ONE tokenize/explode pass feeding two combinable aggregates
    * ((source,term) frequency; per-term document frequency), a term-keyed
    * join AQE broadcasts while the dictionary is small (never a forced
    * hint — the vocabulary is unbounded at corpus scale), a 1-row n_docs
    * broadcast, and a per-source top-k window. The window partitions by
    * source (bounded set) over vocabulary-sized groups — the same
    * group-sort shape as percentile_bands; at a vocabulary where that
    * sort dominates, pre-thin with [[graft.operators.Dedup.topKPerGroup]]
    * on (score, hash-tie) and re-rank the kP survivors exactly. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posting = docs
      .select(col(idCol).cast("long").as("doc_id"), col(srcCol).as("source"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "source", "term").agg(count(lit(1)).as("tf"))
    val srcTf = posting.groupBy("source", "term").agg(sum("tf").as("cf_src"))
    val dict = posting.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val idf6 = floor(log(col("n_docs").cast("double") / col("df")) * lit(1e6))
      .cast("long")
    val scored = srcTf.join(dict, "term").crossJoin(broadcast(nDocs))
      .select(col("source"), col("term"), col("cf_src"),
        (col("cf_src") * idf6).as("score"))
    val w = Window.partitionBy("source").orderBy(desc("score"), asc("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("source"), col("rank"), col("term"), col("cf_src"), col("score"))
  }

  /** Adjacent-bigram collocations by pointwise mutual information —
    * which word pairs co-occur far above chance (named entities, fixed
    * phrases, tokenizer-merge candidates). For each ordered adjacent
    * pair (a,b) with count ≥ minCount:
    * `pmi = ln( (c_ab·M·M) / (c_a·c_b·N) )` where c_* are corpus
    * unigram counts, M total tokens, N total bigrams — micro-quantized
    * with floor into `pmi6` (the oracle computes the IDENTICAL double
    * expression, so the same IEEE value reaches both engines' ln).
    * Bigrams are built as token PAIRS, not joined strings: '_' is a
    * word character in [[TextFns.TokenSep]], so a joined rendering
    * could not be split back unambiguously.
    *
    * Shape: one explode into pairs + one into unigrams (both map-side
    * combinable), two term-keyed dictionary joins (AQE-sized — never a
    * forced broadcast of an unbounded vocabulary), two 1-row total
    * broadcasts. minCount bounds the join fan-in: only pairs that
    * repeat survive to the dictionary lookups. */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 5): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      TextFns.tokens(col(textCol)).as("t"))
    val pairs = toks
      .select(explode(expr(
        "transform(slice(t, 1, greatest(size(t)-1, 0)), (x, i) -> struct(x as a, t[i+1] as b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val uni = toks.select(explode(col("t")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    // ONE pair explode: totals derive from the already-aggregated pair
    // counts (vocabulary²-bounded), never a second pass over the corpus
    val bigAll = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val big = bigAll.where(col("c_ab") >= minCount)
    val totU = uni.agg(sum("c").as("m_tok"))
    val totB = bigAll.agg(sum("c_ab").as("n_big"))
    val scored = big
      .join(uni.withColumnRenamed("term", "a").withColumnRenamed("c", "c_a"), "a")
      .join(uni.withColumnRenamed("term", "b").withColumnRenamed("c", "c_b"), "b")
      .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
    scored.select(col("a"), col("b"), col("c_ab"),
      floor(log((col("c_ab").cast("double") * col("m_tok") * col("m_tok")) /
        (col("c_a").cast("double") * col("c_b") * col("n_big"))) * lit(1e6))
        .cast("long").as("pmi6"))
  }
}
