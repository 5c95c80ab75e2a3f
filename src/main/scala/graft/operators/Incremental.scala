package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Checksum-gated incremental re-index (P4/J4/J6/I1 — the reference's whole
  * re-ingest story: mcp_server/apps/embeddings.py:139-144, fts.py:139-181).
  * In Spark the checksum cache IS the previous table state, and "skip
  * unchanged" is one anti-join — no per-row driver loop.
  */
object Incremental {

  /** P4/J4: rows of `fresh` whose (id, checksum) is NOT in `prev` —
    * i.e. new or modified documents needing re-index. */
  def changed(fresh: DataFrame, prev: DataFrame, idCol: String,
              checksumCol: String): DataFrame =
    fresh.join(prev.select(col(idCol), col(checksumCol)),
      Seq(idCol, checksumCol), "left_anti")

  /** J6: last-writer-wins upsert — keep old rows not superseded, union the
    * new batch (the anti-join + unionByName rewrite of Chroma/SQLite
    * upserts; no transactional table format in scope). */
  def upsert(prev: DataFrame, batch: DataFrame, idCol: String): DataFrame =
    prev.join(batch.select(idCol), Seq(idCol), "left_anti").unionByName(batch)

  /** Bloom-prefiltered anti-join — EXACT `df ▷ seen` (rows of `df` whose
    * key is not in `seen`), shaped for the regime where `df` is the
    * 100 TB crawl and `seen` is a billion-key ledger of already-ingested
    * ids: a plain `left_anti` shuffles ALL of `df` on the key, but with
    * a Bloom filter over the ledger broadcast to the scan, every
    * definite non-member (the overwhelming mass of a mostly-fresh crawl)
    * is kept WITHOUT entering any exchange — only rows the filter
    * cannot rule out (true members + an fpp-fraction of false
    * positives) proceed to the exact anti-join, which kicks the false
    * positives back in. No false negatives exist by the filter's
    * one-sided guarantee, so the result is row-identical to the plain
    * anti-join (property-pinned in AsOfEventsSpec).
    *
    * Sizing: the broadcast costs n·ln(1/fpp)/ln²2 bits — ~1.2 GB for
    * 10⁹ keys at 1% fpp — and must fit each executor; raise `fpp` (or
    * shard the ledger and cascade) past that. The membership probe is a
    * UDF (licensed: Spark's only public column-level Bloom surface is
    * `DataFrameStatFunctions.bloomFilter` + the driver-side sketch
    * object; the Catalyst `might_contain` expression is reserved for
    * AQE's internal runtime filters) — one xxhash-class probe per row,
    * on the narrow prefilter leg only.
    *
    * Key column must be integral or string (`util.sketch.BloomFilter`'s
    * domain). NULL-key rows never match an equi-anti-join, so they are
    * kept, bloom-free, exactly like `left_anti`. An empty ledger
    * degenerates to `df` with no bloom pass at all.
    *
    * The two legs scan `df` twice — deliberate: folding the probe into
    * the anti-join's own condition would still move every row through
    * the join's exchange (non-equi conditions evaluate post-shuffle),
    * while two narrow pushdown-friendly scans + a candidates-only
    * shuffle is the cheap side of the trade at any scale where this
    * operator is worth using. CONTRACT: `df` must therefore be
    * DETERMINISTIC across re-evaluation — the complementary filters
    * re-compute it, and a non-deterministic upstream (`sample` without
    * a seed, `uuid()`, a source mutated between scans) can drop or
    * duplicate rows relative to the plain `left_anti` identity.
    * Cache/localCheckpoint such an upstream first; the same holds for
    * any expensive non-scan upstream (cost, not correctness). */
  def bloomAntiJoin(df: DataFrame, seen: DataFrame, keyCol: String,
                    fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    def family(t: DataType): String = t match {
      case StringType => "string"
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case other => throw new IllegalArgumentException(
        s"bloomAntiJoin key must be integral or string, got $other")
    }
    val dfFam = family(df.schema(keyCol).dataType)
    val seenFam = family(seen.schema(keyCol).dataType)
    // a cross-family pair would build the bloom with one hash encoding
    // and probe with the other: every probe tests negative and matched
    // rows are silently KEPT — refuse instead of diverging from left_anti
    require(dfFam == seenFam,
      s"bloomAntiJoin key type families differ: df=$dfFam seen=$seenFam")
    val isString = dfFam == "string"
    val seenKeys = seen.select(col(keyCol)).where(col(keyCol).isNotNull)
    val nSeen = seenKeys.count()
    if (nSeen == 0L) return df
    val bf = seenKeys.stat.bloomFilter(keyCol, nSeen, fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bf)
    val mightContain =
      if (isString)
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(keyCol))
      else
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(keyCol).cast("long"))
    val definiteKeep = df.where(!mightContain)
    val candidates = df.where(mightContain)
      .join(seenKeys, Seq(keyCol), "left_anti")
    definiteKeep.unionByName(candidates)
  }

  /** Type-2 slowly-changing-dimension merge — the history-preserving
    * upsert ([[upsert]] is last-writer-wins; this keeps every version
    * with its validity interval). `history` rows carry
    * `[valid_from, valid_to)` longs with NULL `valid_to` = open/current;
    * `updates` is the new snapshot batch (must be key-unique — dedupe
    * with Dedup.keepBest first). Per key at `asOf`:
    * attrs unchanged (null-safe) → current row untouched; changed →
    * current row CLOSED at asOf and a new open row appended; unseen
    * key → new open row; keys absent from `updates` → untouched
    * (deletes are out of scope — close them upstream by sending a
    * tombstone attr). Closed history never rejoins anything.
    *
    * Shape: ONE key-keyed full-outer join of the CURRENT slice against
    * the batch, then a single array-of-struct explode emits 1-or-2
    * output rows per joined row — the whole merge is one shuffle and
    * never re-executes the join per output branch (the naive
    * three-way union of keep/close/insert projections re-runs the join
    * three times). The closed slice unions through untouched — at
    * 100 TB with partitioned storage that slice never even scans when
    * the sink supports partition overwrite on the open partition. */
  def scd2Merge(history: DataFrame, updates: DataFrame, keyCol: String,
                attrCols: Seq[String], asOf: Long,
                fromCol: String = "valid_from",
                toCol: String = "valid_to"): DataFrame = {
    val outCols = (keyCol +: attrCols) :+ fromCol :+ toCol
    val past = history.where(col(toCol).isNotNull).select(outCols.map(col): _*)
    // explicit side-presence markers: `c.key IS NULL` would misread a
    // genuine NULL-key open row as "brand-new" and rewrite it from the
    // absent update side as an all-null row (losing its attrs and
    // valid_from). With markers, NULL-key rows are carried losslessly —
    // each side independently, since the equality join never pairs them
    // (a NULL-key update row opens its own history line).
    val cur = history.where(col(toCol).isNull).withColumn("_c", lit(true))
    val u = updates.select(col(keyCol) +: attrCols.map(col): _*)
      .withColumn("_u", lit(true))
    val j = cur.as("c").join(u.as("u"),
      col(s"c.$keyCol") === col(s"u.$keyCol"), "full_outer")
    val changed = attrCols.map(c => !(col(s"c.$c") <=> col(s"u.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def row(side: String, from: Column, to: Column) = struct(
      (col(s"$side.$keyCol").as(keyCol) +:
        attrCols.map(c => col(s"$side.$c").as(c))) :+
        from.as(fromCol) :+ to.cast("long").as(toCol): _*)
    val openNull = lit(null).cast("long")
    val rows = when(col("c._c").isNull,                      // brand-new key
        array(row("u", lit(asOf), openNull)))
      .when(col("u._u").isNull || !changed,                  // no batch row / unchanged
        array(row("c", col(s"c.$fromCol"), openNull)))
      .otherwise(array(                                      // changed: close + insert
        row("c", col(s"c.$fromCol"), lit(asOf)),
        row("u", lit(asOf), openNull)))
    past.unionByName(
      j.select(explode(rows).as("_r")).select(outCols.map(c => col(s"_r.$c")): _*))
  }

  /** Time-travel read over [[scd2Merge]] history: the dimension snapshot
    * as of time `t` — rows whose `[valid_from, valid_to)` interval
    * contains t (open rows have NULL `valid_to` = ∞). A key versioned
    * after t shows its OLD attrs; a key first seen after t is absent.
    * ONE narrow filter over the history scan — with the history stored
    * partitioned/range-clustered on `valid_from` the scan prunes to
    * files whose min valid_from ≤ t; no shuffle at any scale. */
  def scd2AsOf(history: DataFrame, t: Long,
               fromCol: String = "valid_from",
               toCol: String = "valid_to"): DataFrame =
    history.where(col(fromCol) <= t &&
      (col(toCol).isNull || col(toCol) > t))
}
