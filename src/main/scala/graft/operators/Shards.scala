package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export shard assignment (builder brief: the packing step a
  * large-scale pipeline runs between filtering and tokenized-shard
  * writing): documents in stable id order are laid out consecutively and
  * cut into shards of `tokensPerShard` tokens, a document starting in the
  * shard its cumulative offset falls in (the straddling document may
  * carry a shard past the budget — standard offset packing; no document
  * is split).
  *
  * Scale shape — the naive form is a GLOBAL ordered window
  * (`sum(n_tok) over (order by doc_id)`), which Spark executes as a
  * single-partition exchange: one task sees 100 TB. This implementation
  * is the classic two-pass prefix sum instead:
  *
  *   1. range-partition by id (so partition p holds an id range wholly
  *      before partition p+1's), snapshot the partition id;
  *   2. per-partition token totals → driver (bounded by the partition
  *      count — planning data, not corpus data);
  *   3. prefix-sum those totals on the driver, broadcast the offsets
  *      back, and add a per-PARTITION ordered window (each window sees
  *      only its partition's rows).
  *
  * Every stage is bounded: two corpus shuffles (the range exchange + the
  * per-partition window's clustering), a W-row collect, a broadcast join.
  */
object Shards {

  /** Range-exchange width: the caller's override, else the session's
    * shuffle parallelism — defensively parsed (the conf value may be
    * non-numeric under AQE-adjacent configs or user overrides). */
  private[operators] def rangeWidth(spark: org.apache.spark.sql.SparkSession, width: Int): Int =
    if (width > 0) width
    else scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .toOption.filter(_ > 0).getOrElse(32)

  /** Token measures for packing/budgeting: what one "token" costs.
    * `words` = the regex-class word count (the default everywhere);
    * `subwords` = the vocabulary-free BPE-style estimate
    * ([[TextFns.subwordCount]]) — use it when the training recipe's
    * budget is subword-denominated. Both are narrow per-row column
    * expressions; swapping the measure changes no plan shape. */
  object TokenMeasure {
    val words: Column => Column = t => size(TextFns.tokens(t)).cast("long")
    val subwords: Column => Column = t => TextFns.subwordCount(t)
  }

  /** Fixed-window document CHUNKING — the context-window prep step
    * [[packShards]] assumes already happened when documents exceed the
    * training sequence length: split each doc's token stream into
    * windows of ≤ `chunkLen` tokens starting every `stride` tokens
    * (stride < chunkLen ⇒ the standard `chunkLen − stride` token
    * overlap that keeps boundary context in BOTH neighbors; stride =
    * chunkLen ⇒ disjoint windows). Window starts are 0, stride,
    * 2·stride, … < n, so every token is covered and the final window
    * may be short — the usual RAG/embedding-chunk grammar, all
    * integer arithmetic, exactly SQL-replayable. Pure narrow per-row
    * work (tokenize + slice per start); the explode multiplies rows by
    * ~n/stride, never wider. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1 && stride >= 1 && stride <= chunkLen,
      "need 1 <= stride <= chunkLen")
    val toks = TextFns.tokens(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .withColumn("s",
        explode(when(size(col("t")) > 0,
          filter(transform(
            sequence(lit(0), ((size(col("t")) - 1) / stride).cast("int")),
            i => i * stride), s => s < size(col("t"))))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), (col("s") / stride).cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("t"), col("s") + 1, lit(chunkLen))).as("text_chunk"),
        least(lit(chunkLen), size(col("t")) - col("s")).cast("long").as("n_tokens"))
  }

  /** (doc_id, n_tok, shard) for every document. `width` bounds the range
    * partitioning (and so the driver-side offset table); `measure`
    * picks the token denomination ([[TokenMeasure]]). */
  def packShards(docs: DataFrame, idCol: String, textCol: String,
                 tokensPerShard: Long, width: Int = 0,
                 measure: Column => Column = TokenMeasure.words): DataFrame = {
    val spark = docs.sparkSession
    val w = rangeWidth(spark, width)
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(greatest(measure(col(textCol)), lit(0L)), lit(0L)).as("n_tok"))
    // snapshot AFTER the range exchange: the partition id must be the
    // same value in the totals pass and the final pass (range boundaries
    // are sampled, so re-executing the exchange could re-cut them)
    val ranged = toks.repartitionByRange(w, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: per-partition totals — W rows of planning data
    val totals = ranged.groupBy("pid").agg(sum("n_tok").as("ptok"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    // pass 2: per-partition ordered cumsum + the broadcast offset
    val inPart = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("cum_before", sum("n_tok").over(inPart) - col("n_tok"))
      .join(broadcast(offsetsDf), "pid")
      .select(col("doc_id"), col("n_tok"),
        floor((col("offset") + col("cum_before")) / tokensPerShard).as("shard"))
  }

  /** Token-budget selection — the "data diet" cut: take documents in
    * descending score order (doc_id ascending as the total-order
    * tie-break) until the token budget is exhausted; a document is kept
    * iff its INCLUSIVE cumulative token count fits the budget (no
    * straddler — selection under budget, unlike [[packShards]]' layout
    * semantics). This is the selection step between quality scoring and
    * export when the training recipe fixes a token count, not a rate.
    *
    * Same two-pass prefix-sum discipline as [[packShards]], with the
    * range exchange keyed on (score DESC, id): the naive form is a
    * GLOBAL ordered cumsum = a single task seeing the corpus. Input is
    * any frame carrying (id, score, token-count) — compose with
    * [[TextAnalysis.qualityStats]]/qScore6 upstream. */
  def budgetSelect(scored: DataFrame, idCol: String, scoreCol: String,
                   tokCol: String, budget: Long, width: Int = 0): DataFrame = {
    val spark = scored.sparkSession
    val w = rangeWidth(spark, width)
    // null token counts contribute 0 to every cumulative sum (instead of
    // NPE-ing the totals collect below or silently nulling cum_tok)
    val ranged = scored.select(col(idCol).cast("long").as("doc_id"),
        col(scoreCol).as("q_score"),
        coalesce(col(tokCol).cast("long"), lit(0L)).as("n_tok"))
      .repartitionByRange(w, col("q_score").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy("pid").agg(sum("n_tok").as("ptok"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val inPart = Window.partitionBy("pid")
      .orderBy(col("q_score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("cum_in", sum("n_tok").over(inPart))
      .join(broadcast(offsetsDf), "pid")
      .withColumn("cum_tok", col("offset") + col("cum_in"))
      .where(col("cum_tok") <= budget)
      .select(col("doc_id"), col("q_score"), col("n_tok"), col("cum_tok"))
  }

  /** Deterministic corpus shuffle — the training-export ordering step:
    * every document gets a stable pseudo-random position 0..n-1, the
    * total order being (md5(seed ":" id), id). Changing the seed gives
    * an uncorrelated new epoch order; the same seed reproduces the
    * exact order on any engine (md5 of the same string is
    * engine-identical — the library's sampling-grid doctrine, here as
    * an ORDER).
    *
    * Scale shape: the naive form is `row_number() OVER (ORDER BY hash)`
    * — a SinglePartition window, one task sorting 100 TB. This is the
    * two-pass prefix-count instead (the [[packShards]] discipline):
    * range-exchange on the hash key, per-partition counts to the driver
    * (W rows of planning data), prefix offsets broadcast back, and a
    * per-PARTITION row_number. Two corpus shuffles, no global sort on
    * one task; the output is exactly the naive form's permutation. */
  def shuffleOrder(docs: DataFrame, idCol: String, seed: String,
                   width: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val w = rangeWidth(spark, width)
    val keyed = docs.select(col(idCol).cast("long").as("doc_id"))
      .withColumn("shuffle_key",
        md5(concat(lit(seed), lit(":"), col("doc_id").cast("string"))))
    // snapshot after the exchange: range boundaries are sampled, so the
    // counts pass and the final pass must see the SAME cuts
    val ranged = keyed.repartitionByRange(w, col("shuffle_key"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy("pid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val inPart = Window.partitionBy("pid").orderBy("shuffle_key", "doc_id")
    ranged
      .withColumn("rn", row_number().over(inPart).cast("long"))
      .join(broadcast(offsetsDf), "pid")
      .select(col("doc_id"), col("shuffle_key"),
        (col("offset") + col("rn") - 1).as("pos"))
  }

  /** Materialize the training export: [[packShards]]' assignment joined
    * back to the full rows, written as parquet partitioned by shard,
    * plus a manifest (one row per shard: doc count, token sum, and an
    * order-insensitive id checksum) written as JSON next to the data —
    * the receipt a downstream trainer (or a re-export audit) verifies
    * against. Returns the manifest frame.
    *
    * The checksum is `Σ pmod(xxhash64(id), 2^61-1)` accumulated in
    * decimal(38,0) — commutative and O(1) aggregation state per shard,
    * deliberately NOT a sorted-concat digest: a shard's id list is NOT
    * bounded by tokensPerShard (zero-token documents consume no budget,
    * so a pre-filter corpus can legally pack millions of empty docs
    * into one shard), and a collect_list there is an executor OOM.
    * Verify by recomputing the same aggregate over a shard's ids.
    *
    * Shape: ONE corpus pass — the doc-keyed assignment join streams
    * straight into the partitioned write; the manifest then aggregates
    * the JUST-WRITTEN files (the on-disk data is the cache — no
    * re-execution of the join, and the receipt describes the bytes
    * actually on disk, not a recomputation that could diverge). The
    * manifest write is |shards| rows — planning-scale. */
  def writeShards(docs: DataFrame, idCol: String, textCol: String,
                  tokensPerShard: Long, outPath: String,
                  width: Int = 0): DataFrame = {
    val assign = packShards(docs, idCol, textCol, tokensPerShard, width)
      .withColumnRenamed("doc_id", "_shard_did")
    docs
      .join(assign, col(idCol).cast("long") === col("_shard_did"))
      .drop("_shard_did")
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outPath/data")
    val manifest = shardManifest(docs.sparkSession, s"$outPath/data", idCol)
    manifest.coalesce(1).write.mode("overwrite").json(s"$outPath/manifest")
    manifest
  }

  /** The manifest aggregate over a written shard directory — exposed so
    * an audit can recompute the receipt independently of the export. */
  def shardManifest(spark: org.apache.spark.sql.SparkSession,
                    dataPath: String, idCol: String): DataFrame =
    spark.read.parquet(dataPath)
      // parquet partition-column inference reads the shard id back as int
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum(pmod(xxhash64(col(idCol).cast("long")), lit(2305843009213693951L))
          .cast("decimal(38,0)")).as("ids_checksum"))
}
