package graft

import graft.operators.{AsOf, Events, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The round-10 batch: as-of join contract, hourly anomaly scoring,
  * source-level quality rollup, length histogram. */
class AsOfEventsSpec extends SparkSpec {
  import spark.implicits._

  // left: (event_id, user_id, ts, value)
  private lazy val purchases = Seq(
    (100L, 1L, 1000L, 9.0),  // after two views → latest (ts=900) wins
    (101L, 1L, 500L, 8.0),   // ties a view at ts=500 → <= visible
    (102L, 2L, 50L, 7.0),    // before any view → null match
    (103L, 3L, 1000L, 6.0)   // user with two equal-ts views → max id wins
  ).toDF("event_id", "user_id", "ts", "value")
  private lazy val views = Seq(
    (10L, 1L, 400L, 1.0),
    (11L, 1L, 900L, 2.0),
    (12L, 1L, 500L, 3.0),
    (13L, 2L, 100L, 4.0),    // after purchase 102 — must not match
    (14L, 3L, 800L, 5.0),
    (15L, 3L, 800L, 5.5)     // same ts as 14 → higher event_id wins
  ).toDF("event_id", "user_id", "ts", "value")

  private def runAsof(tol: Option[Long] = None) =
    AsOf.asofJoin(purchases, views, "user_id", "ts", "event_id",
      rightCols = Seq("value"), toleranceNs = tol, prefix = "v_")
      .select("event_id", "v_event_id", "v_ts", "v_value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2), r.getDouble(3)))))
      .toMap

  test("asofJoin picks the latest at-or-before right row per key") {
    val m = runAsof()
    assert(m(100L) === Some((11L, 900L, 2.0)), "latest prior view")
    assert(m(101L) === Some((12L, 500L, 3.0)), "equal-ts right row is visible (<=)")
    assert(m(102L) === None, "no view at-or-before → null")
    assert(m(103L) === Some((15L, 800L, 5.5)), "equal-ts right ties break to max tie col")
  }

  test("asofJoin tolerance nulls out stale matches but keeps fresh ones") {
    val m = runAsof(tol = Some(150L))
    assert(m(100L) === Some((11L, 900L, 2.0)), "gap 100 <= 150 kept")
    assert(m(101L) === Some((12L, 500L, 3.0)), "gap 0 kept")
    assert(m(103L) === None, "gap 200 > 150 nulled")
  }

  test("asofJoin equals the naive per-row maximum on random data") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 300).map(i => (i.toLong, (rnd.nextInt(5) + 1).toLong,
      rnd.nextInt(100).toLong, rnd.nextDouble()))
    val r = (1000 until 1400).map(i => (i.toLong, (rnd.nextInt(5) + 1).toLong,
      rnd.nextInt(100).toLong, rnd.nextDouble()))
    val got = AsOf.asofJoin(l.toDF("event_id", "user_id", "ts", "value"),
      r.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", rightCols = Seq("value"))
      .select("event_id", "asof_event_id")
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
    l.foreach { case (id, key, ts, _) =>
      val naive = r.filter(x => x._2 == key && x._3 <= ts)
        .sortBy(x => (x._3, x._1)).lastOption.map(_._1).getOrElse(-1L)
      assert(got(id) === naive, s"left row $id")
    }
  }

  test("asofJoinBucketed is row-identical to asofJoin across bucket widths") {
    val rnd = new scala.util.Random(11)
    // dense ts range so bucket boundaries land BETWEEN matches and ties
    // straddle them; key 1 is hot (most rows) to exercise the spread
    val l = (0 until 400).map(i => (i.toLong,
      (if (rnd.nextInt(3) == 0) rnd.nextInt(4) + 2 else 1).toLong,
      rnd.nextInt(120).toLong, rnd.nextDouble()))
    val r = (1000 until 1500).map(i => (i.toLong,
      (if (rnd.nextInt(3) == 0) rnd.nextInt(4) + 2 else 1).toLong,
      rnd.nextInt(120).toLong, rnd.nextDouble()))
    val lDf = l.toDF("event_id", "user_id", "ts", "value")
    val rDf = r.toDF("event_id", "user_id", "ts", "value")
    for (tol <- Seq(None, Some(25L)); width <- Seq(1L, 7L, 64L, 1000L)) {
      val plain = AsOf.asofJoin(lDf, rDf, "user_id", "ts", "event_id",
        Seq("value"), toleranceNs = tol).orderBy("event_id").collect().toSeq
      val bucketed = AsOf.asofJoinBucketed(lDf, rDf, "user_id", "ts", "event_id",
        Seq("value"), bucketWidth = width, toleranceNs = tol)
        .orderBy("event_id").collect().toSeq
      assert(bucketed === plain, s"width=$width tol=$tol")
    }
  }

  test("asofJoin null semantics: null-key/null-ts right rows never match; null-key left never matches") {
    val lRows = Seq(
      Row(1L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(100L), 1.0),
      Row(2L, null, java.lang.Long.valueOf(100L), 2.0))
    val rRows = Seq(
      Row(10L, java.lang.Long.valueOf(1L), null, 3.0),   // null ts → dropped
      Row(11L, null, java.lang.Long.valueOf(50L), 4.0),  // null key → dropped
      Row(12L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(60L), 5.0))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType, true),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType, true),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType, false)))
    import scala.jdk.CollectionConverters._
    val lDf = spark.createDataFrame(lRows.asJava, schema)
    val rDf = spark.createDataFrame(rRows.asJava, schema)
    for (fn <- Seq(
      AsOf.asofJoin(lDf, rDf, "user_id", "ts", "event_id", Seq("value")),
      AsOf.asofJoinBucketed(lDf, rDf, "user_id", "ts", "event_id", Seq("value"), 50L))) {
      val m = fn.collect().map { r =>
        val i = r.fieldIndex("asof_event_id")
        r.getLong(0) -> (if (r.isNullAt(i)) -1L else r.getLong(i))
      }.toMap
      assert(m(1L) === 12L, "only the fully-keyed right row matches")
      assert(m(2L) === -1L, "null-key left row matches nothing")
    }
  }

  test("asofJoinBucketed carries non-orderable (map) payload columns") {
    val l = purchases
    val r = views.withColumn("props", map(lit("k"), col("event_id").cast("string")))
    val out = AsOf.asofJoinBucketed(l, r, "user_id", "ts", "event_id",
      Seq("value", "props"), bucketWidth = 300L, prefix = "v_")
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(row.fieldIndex("v_props"))) null
         else row.getMap[String, String](row.fieldIndex("v_props")).get("k").orNull)).toMap
    assert(out(100L) === "11", "map payload rides the closing carry-forward")
    assert(out(102L) === null)
  }

  test("asofJoin defaults use the asof_ prefix") {
    val cols = AsOf.asofJoin(purchases, views, "user_id", "ts", "event_id",
      rightCols = Seq("value")).columns.toSet
    assert(cols.contains("asof_ts") && cols.contains("asof_value"))
  }

  private def eventsDf(rows: Seq[(Long, String)]) =
    rows.zipWithIndex.map { case ((hour, typ), i) =>
      (i.toLong, hour * 3600000000000L + 1L, typ)
    }.toDF("event_id", "ts", "event_type")

  test("hourlyAnomalies: constant series → NULL z, nothing flagged") {
    val df = eventsDf((0L until 10L).flatMap(h => Seq.fill(3)((h, "steady"))))
    val out = Events.hourlyAnomalies(df, "event_type").collect()
    assert(out.length === 10)
    assert(out.forall(_.isNullAt(3)), "variance 0 ⇒ z NULL")
    assert(out.forall(!_.getBoolean(4)), "no anomaly on constant volume")
  }

  test("hourlyAnomalies flags a volume spike and only the spike") {
    val base = (0L until 20L).flatMap(h => Seq.fill(2)((h, "x")))
    val spike = Seq.fill(40)((20L, "x"))
    val out = Events.hourlyAnomalies(eventsDf(base ++ spike), "event_type")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(20L)._1 === 40L)
    assert(out(20L)._2, "spike hour flagged")
    assert(out.filter(_._1 != 20L).values.forall(!_._2), "baseline hours quiet")
  }

  test("funnel enforces stage order in time; naive per-stage min would overcount") {
    // user 1: full ordered funnel; user 2: purchase BEFORE click (stage 3
    // unreached in order); user 3: click only (no signup ⇒ nothing counts)
    val ev = Seq(
      (1L, 100L, "signup"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "signup"), (2L, 500L, "click"), (2L, 400L, "purchase"),
      (3L, 100L, "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Events.funnel(ev, "user_id", "event_type",
      Seq("signup", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1) === ((2L, 0L)), "two signups, dt 0")
    assert(out(2) === ((2L, 500L)), "both users click after signup")
    assert(out(3)._1 === 1L, "user 2's early purchase must NOT count")
    // same-instant stage transition counts (>= semantics)
    val tie = Seq((9L, 50L, "signup"), (9L, 50L, "click")).toDF("user_id", "ts", "event_type")
    val t = Events.funnel(tie, "user_id", "event_type", Seq("signup", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(t(2) === 1L, "equal-ts next stage is reached")
  }

  test("funnel: total rollup on empty input, null users excluded, iterative twin equal") {
    val empty = Seq.empty[(Long, Long, String)].toDF("user_id", "ts", "event_type")
    val e = Events.funnel(empty, "user_id", "event_type", Seq("a", "b")).collect()
    assert(e.length === 2, "one row per stage even over empty input")
    assert(e.forall(r => r.getLong(2) === 0L && r.isNullAt(3) && r.isNullAt(4)))
    // null users never count (oracle equi-join semantics)
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(null, 1L, "a"),
        org.apache.spark.sql.Row(java.lang.Long.valueOf(7L), 2L, "a")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, true),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType, false))))
    val n = Events.funnel(withNull, "user_id", "event_type", Seq("a"))
      .collect().head.getLong(2)
    assert(n === 1L, "null-user stage event excluded")
    // iterative twin: identical rows on a random corpus
    val rnd = new scala.util.Random(31)
    val stages = Seq("s1", "s2", "s3")
    val ev = (0 until 600).map(_ => ((rnd.nextInt(20) + 1).toLong,
      rnd.nextInt(500).toLong, stages(rnd.nextInt(3)))).toDF("user_id", "ts", "event_type")
    val a = Events.funnel(ev, "user_id", "event_type", stages).collect().toSeq
    val b = Events.funnelIterative(ev, "user_id", "event_type", stages).collect().toSeq
    assert(a === b, s"single-pass vs iterative diverge:\n$a\n$b")
  }

  test("windowed funnel bounds each conversion step; twins agree under the bound") {
    // user 1 clicks 150 ns after signup (inside a 200 ns window), user 2
    // clicks 300 ns after (outside); user 4 has a late click AND an
    // in-window one — min-in-window must pick the in-window event, and a
    // stage missed on the window nulls the later stages
    val ev = Seq(
      (1L, 100L, "signup"), (1L, 250L, "click"), (1L, 400L, "purchase"),
      (2L, 100L, "signup"), (2L, 400L, "click"), (2L, 450L, "purchase"),
      (4L, 100L, "signup"), (4L, 180L, "click"), (4L, 500L, "click")
    ).toDF("user_id", "ts", "event_type")
    val stages = Seq("signup", "click", "purchase")
    val out = Events.funnel(ev, "user_id", "event_type", stages,
        maxStepNs = Some(200L))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) === 3L, "all signed up")
    assert(out(2) === 2L, "user 2's 300 ns click falls outside the window")
    assert(out(3) === 1L, "only user 1 purchases within 200 ns of the click")
    // unwindowed ⊇ windowed at every stage, and the two twins stay
    // identical under the bound on a random corpus
    val rnd = new scala.util.Random(77)
    val big = (0 until 600).map(_ => ((rnd.nextInt(20) + 1).toLong,
      rnd.nextInt(500).toLong, Seq("s1", "s2", "s3")(rnd.nextInt(3))))
      .toDF("user_id", "ts", "event_type")
    val w = Events.funnel(big, "user_id", "event_type", Seq("s1", "s2", "s3"),
      maxStepNs = Some(60L)).collect().toSeq
    val wi = Events.funnelIterative(big, "user_id", "event_type",
      Seq("s1", "s2", "s3"), maxStepNs = Some(60L)).collect().toSeq
    assert(w === wi, s"windowed single-pass vs iterative diverge:\n$w\n$wi")
    val un = Events.funnel(big, "user_id", "event_type", Seq("s1", "s2", "s3"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    w.foreach(r => assert(r.getLong(2) <= un(r.getInt(0)),
      "window must only prune, never add"))
  }

  test("retention cohorts count distinct users per (first day, offset)") {
    val day = 86400L * 1000000000L
    val ev = Seq(
      (1L, 0L), (1L, 1L), (1L, 1L), (1L, 3L),  // cohort 0, offsets 0,1,3
      (2L, 1L), (2L, 2L),                      // cohort 1, offsets 0,1
      (3L, 0L)                                 // cohort 0, offset 0
    ).map { case (u, d) => (u, d * day + 5L, "click") }
      .toDF("user_id", "ts", "event_type")
    val out = Events.retentionCohorts(ev, "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) === 2L)
    assert(out((0L, 1L)) === 1L)
    assert(out((0L, 3L)) === 1L)
    assert(out((1L, 0L)) === 1L)
    assert(out((1L, 1L)) === 1L)
    assert(out.size === 5)
  }

  test("sourceOverlap counts shared sub-cap shingles; boilerplate above the cap is excluded") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta", "sa"),       // shares 'alpha beta gamma'…
      (2L, "alpha beta gamma epsilon", "sb"),     // …with sa (2 shared 3-grams? one: a_b_g)
      (3L, "zeta eta theta iota", "sc"),          // disjoint
      // boilerplate phrase in EVERY doc of all sources would claim all
      // pairs overlap; with maxDf=3 a phrase in 4 docs is excluded
      (4L, "common footer text here", "sa"),
      (5L, "common footer text here", "sb"),
      (6L, "common footer text here", "sc"),
      (7L, "common footer text here", "sc")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs, "doc_id", "text", "source", n = 3, maxDf = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("sa", "sb")) === 1L, "alpha_beta_gamma shared (sub-cap)")
    assert(!out.contains(("sa", "sc")), "footer shingles sit in 4 docs > cap — excluded")
    assert(!out.contains(("sb", "sc")))
  }

  test("sourceQualityRollup aggregates the cascade and flags junk sources") {
    val good = (0 until 8).map(i => (i.toLong,
      "the quick brown fox jumps over the lazy dog and runs far into the " +
        "quiet green field while the sun sets slowly over a calm river " +
        "and the birds sing in the trees as evening comes to the valley", "good"))
    val junk = (10 until 18).map(i => (i.toLong, "zz zz zz zz zz", "junk"))
    val df = (good ++ junk).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceQualityRollup(df, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(5))).toMap
    assert(out("good") === ((8L, 8L, true)))
    assert(out("junk")._1 === 8L)
    assert(out("junk")._2 === 0L, "junk docs all fail the cascade")
    assert(!out("junk")._3, "junk source dropped")
    // per-doc consistency: n_kept equals the qualityFilter kept count
    val kept = TextAnalysis.qualityFilter(df, "doc_id", "text")
      .where(col("kept")).count()
    assert(out.values.map(_._2).sum === kept)
  }

  test("stripRepeats deletes only post-first n-gram occurrences, overlaps union") {
    val df = Seq(
      (1L, "a b c x a b c"),          // 3-gram "a b c" repeats → 2nd occurrence (pos 5-7) stripped
      (2L, "a a a a a"),              // self-overlapping run: grams at 1..3, dups at 2,3 cover 2..5
      (3L, "u v w x y z"),            // no repeats → untouched
      (4L, "p q"),                    // shorter than n → untouched
      (5L, "")                        // empty → untouched
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripRepeats(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(out(1L) === (("a b c x", 3L)))
    assert(out(2L) === (("a", 4L)), "overlapping dups cover positions 2..5")
    assert(out(3L) === (("u v w x y z", 0L)))
    assert(out(4L) === (("p q", 0L)))
    assert(out(5L) === (("", 0L)))
    // idempotent: stripping a stripped corpus strips nothing
    val once = TextAnalysis.stripRepeats(df, "doc_id", "text", 3)
      .select(col("doc_id"), col("text_clean").as("text"))
    val twice = TextAnalysis.stripRepeats(once, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(twice.values.forall(_ === 0L), "second pass strips nothing")
  }

  test("profile: hotKeys ranks with deterministic ties; columnProfile counts nulls/distincts") {
    import graft.operators.Profile
    val ev = (Seq.fill(5)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(3)(3L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val hot = Profile.hotKeys(ev, Seq("user_id"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hot.toSeq === Seq((1L, 5L, 0.384615), (2L, 5L, 0.384615)),
      "equal counts break ties by key ascending")
    val docs = Seq((1L, "a", null: String), (2L, "a", "x"), (3L, null: String, "x"))
      .toDF("id", "t", "s")
    val prof = Profile.columnProfile(docs, Seq("id", "t", "s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof("id") === ((0L, 3L)))
    assert(prof("t") === ((1L, 1L)), "null excluded from distinct")
    assert(prof("s") === ((1L, 1L)))
  }

  test("budgetSelect keeps best-score docs with inclusive budget fit and id tie-break") {
    import graft.operators.Shards
    val scored = Seq(
      (1L, 0.9, 40L),  // rank 1 → cum 40 ✓
      (2L, 0.5, 30L),  // rank 4 → cum 120 > 100 ✗
      (3L, 0.7, 30L),  // rank 2 (tie with 4, lower id first) → cum 70 ✓
      (4L, 0.7, 20L),  // rank 3 → cum 90 ✓
      (5L, 0.1, 5L)    // rank 5 — budget already blown for rank 4 but 5 fits? NO: cum is positional
    ).toDF("doc_id", "q", "n_tok")
    val out = Shards.budgetSelect(scored, "doc_id", "q", "n_tok", budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.keySet === Set(1L, 3L, 4L), s"greedy prefix only: $out")
    assert(out(1L) === 40L && out(3L) === 70L && out(4L) === 90L)
    // whole corpus fits → everything kept, cum equals the total order
    val all = Shards.budgetSelect(scored, "doc_id", "q", "n_tok", budget = 10000L)
    assert(all.count() === 5L)
  }

  test("compactParquet merges small files; clusterBy yields disjoint per-file key ranges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
    val df = (0 until 1000).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    df.repartition(32).write.mode("overwrite").parquet(s"$tmp/frag")
    val stats = graft.operators.Compact.compactParquet(spark, s"$tmp/frag",
      s"$tmp/out", targetBytes = 16L * 1024, clusterBy = Seq("doc_id"))
    assert(stats.files_in === 32L)
    assert(stats.files_out < stats.files_in, s"no compaction: $stats")
    assert(stats.rows === 1000L, "rows preserved")
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ===
      (0L until 1000L).toSet, "content preserved")
    // clustering contract: each output file covers a disjoint key range
    val ranges = back.select(input_file_name().as("f"), col("doc_id"))
      .groupBy("f").agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("heavyHitters equals the exact GROUP BY threshold, nulls and strict > included") {
    import graft.operators.Profile
    val rnd = new scala.util.Random(17)
    val keys: Seq[Option[String]] =
      Seq.fill(600)(Some("a")) ++ Seq.fill(300)(Some("b")) ++
        Seq.fill(80)(None) ++ (0 until 400).map(i => Some(s"t${rnd.nextInt(200)}"))
    val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k.orNull) }
      .toDF("id", "k")
    val total = keys.size.toLong
    Seq(2, 5, 20, 200).foreach { m =>
      val expected = keys.groupBy(identity).view
        .mapValues(_.size.toLong).filter { case (_, n) => n * m > total }
        .map { case (k, n) => k.orNull -> n }.toMap
      val got = Profile.heavyHitters(df, "k", m)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected, s"m=$m")
    }
    // strictness: n*m == total is NOT a heavy hitter
    val half = (Seq.fill(5)("x") ++ Seq.fill(5)("y")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    assert(Profile.heavyHitters(half, "k", 2).count() === 0L)
    // empty input → empty result (and no divide-by-zero on the total)
    assert(Profile.heavyHitters(half.where(lit(false)), "k", 3).count() === 0L)
  }

  test("bloomAntiJoin is row-identical to left_anti for long and string keys") {
    import graft.operators.Incremental
    val rnd = new scala.util.Random(23)
    val big = (0 until 500).map { i =>
      (i.toLong, if (i % 37 == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong))
    }.toDF("id", "k")
    val seen = ((0 until 99 by 7) ++ Seq(500, 501)).map(_.toLong).toDF("k")
    val expected = big.join(seen, Seq("k"), "left_anti")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val got = Incremental.bloomAntiJoin(big, seen, "k")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expected)
    assert(got.contains(0L), "null-key rows are kept")
    val bigS = big.withColumn("k", concat(lit("s"), col("k")))
    val seenS = seen.withColumn("k", concat(lit("s"), col("k")))
    val expS = bigS.join(seenS, Seq("k"), "left_anti")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val gotS = Incremental.bloomAntiJoin(bigS, seenS, "k")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotS === expS)
    // empty ledger degenerates to the input; unsupported key types refuse
    assert(Incremental.bloomAntiJoin(big, seen.where(lit(false)), "k").count()
      === big.count())
    intercept[IllegalArgumentException] {
      Incremental.bloomAntiJoin(big.withColumn("k", col("k").cast("double")),
        seen, "k")
    }
    // cross-family keys would probe with the wrong hash encoding and
    // silently keep matched rows — must refuse up front
    intercept[IllegalArgumentException] {
      Incremental.bloomAntiJoin(big, seenS, "k")
    }
  }

  test("rollingHourly: RANGE frame ages silent hours out by bucket distance") {
    import graft.operators.Events
    val h = 3600000000000L
    val ev = Seq(
      (1L, "a", 0L * h + 5L), (2L, "a", 0L * h + 9L),   // hour 0: n=2
      (3L, "a", 1L * h + 1L),                           // hour 1: n=1
      (4L, "a", 26L * h + 2L), (5L, "a", 26L * h + 3L), (6L, "a", 26L * h + 4L),
      (7L, "b", 0L * h + 1L)                            // series isolation
    ).toDF("event_id", "event_type", "ts")
    val out = Events.rollingHourly(ev, "event_type")
      .collect().map(r => (r.getString(1), r.getLong(0)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(("a", 0L)) === ((2L, 2L, 1L, 2L)))
    assert(out(("a", 1L)) === ((1L, 3L, 2L, 1L)), "trailing window spans hours 0-1")
    // hour 26 is 25 buckets past hour 1: a ROWS frame would still see it,
    // the RANGE frame must not
    assert(out(("a", 26L)) === ((3L, 3L, 1L, 3L)), "silent gap evicts older hours")
    assert(out(("b", 0L)) === ((1L, 1L, 1L, 1L)))
  }

  test("intervalJoin equals the naive range predicate across bucket widths") {
    val rnd = new scala.util.Random(13)
    val probe = (0 until 200).map { i =>
      (i.toLong, if (i % 41 == 0) null else java.lang.Long.valueOf(rnd.nextInt(1000).toLong))
    }
    def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val ivs: Seq[(Long, java.lang.Long, java.lang.Long)] = (0 until 40).map { i =>
      val s = rnd.nextInt(1000).toLong - 100L
      val span = rnd.nextInt(300).toLong
      val (lo, hi): (java.lang.Long, java.lang.Long) = i % 10 match {
        case 7 => (jl(s), jl(s - 10L))  // inverted → dropped
        case 8 => (null, jl(s))         // null bound → dropped
        case 9 => (jl(s), jl(s))        // zero-length → point match
        case _ => (jl(s), jl(s + span))
      }
      (i.toLong, lo, hi)
    }
    val expected = (for {
      (pid, ts) <- probe if ts != null
      (ivId, lo, hi) <- ivs
      if lo != null && hi != null && lo <= hi && lo <= ts && ts <= hi
    } yield (pid, ivId)).toSet
    val pDf = probe.toDF("pid", "ts")
    val ivDf = ivs.toDF("iv_id", "lo", "hi")
    Seq(1L, 7L, 100000L).foreach { w =>
      val got = AsOf.intervalJoin(pDf, ivDf, "ts", "lo", "hi",
          bucketWidth = w, ivCols = Seq("iv_id"))
        .select("pid", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"width=$w")
    }
    // column-collision guards, including the internal bucket column
    intercept[IllegalArgumentException] {
      AsOf.intervalJoin(pDf.withColumn("iv_id", lit(1L)), ivDf, "ts", "lo", "hi",
        bucketWidth = 10L, ivCols = Seq("iv_id"))
    }
    intercept[IllegalArgumentException] {
      AsOf.intervalJoin(pDf.withColumn("_b", lit(1L)), ivDf, "ts", "lo", "hi",
        bucketWidth = 10L, ivCols = Seq("iv_id"))
    }
    // an open-ended sentinel interval must fail loudly, not explode a
    // billion-element sequence in one task
    val openEnded = Seq((1L, 0L, Long.MaxValue)).toDF("iv_id", "lo", "hi")
    val ex = intercept[Exception] {
      AsOf.intervalJoin(pDf, openEnded, "ts", "lo", "hi",
        bucketWidth = 10L, ivCols = Seq("iv_id"), maxBucketsPerInterval = 100)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("clamp open-ended intervals")),
      s"unexpected error: $ex")
  }

  test("assignSessions tags events with 1-based user-scoped session ordinals") {
    import graft.operators.Events
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 100L),      // session 1
      (3L, 1L, 2000L), (4L, 1L, 2100L),  // gap 1900 > 1000 → session 2
      (5L, 2L, 50L),                     // other user: own numbering
      (6L, 1L, 2100L)                    // same ts as 4 → id order, same session
    ).toDF("event_id", "user_id", "ts")
    val out = Events.assignSessions(ev, "user_id", gapNs = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 2L))
    // parity with the events_sessions rollup: max ordinal == session count
    val rolled = Events.assignSessions(ev, "user_id", gapNs = 1000L)
      .groupBy("user_id").agg(max("session_seq").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rolled === Map(1L -> 2L, 2L -> 1L))
  }

  test("percentileBands reads exact nearest-rank values, duplicates and singletons included") {
    import graft.operators.Profile
    val df = ((1 to 10).map(v => ("a", java.lang.Long.valueOf(v.toLong))) ++
      Seq(("b", java.lang.Long.valueOf(7L))) ++
      Seq(("c", java.lang.Long.valueOf(2L)), ("c", java.lang.Long.valueOf(2L)),
        ("c", java.lang.Long.valueOf(2L)), ("c", java.lang.Long.valueOf(5L))) ++
      Seq(("d", null.asInstanceOf[java.lang.Long]))).toDF("g", "v")
    val out = Profile.percentileBands(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") === ((5L, 9L, 10L)), "1..10: ranks 5/9/10")
    assert(out("b") === ((7L, 7L, 7L)), "singleton: every band is the value")
    assert(out("c") === ((2L, 5L, 5L)), "duplicates: rank-2 value 2, rank-4 value 5")
    assert(!out.contains("d"), "all-null group has no rankable values")
    intercept[IllegalArgumentException] {
      Profile.percentileBands(df.withColumn("v", col("v").cast("double")), "g", "v")
    }
  }

  test("saltedJoin is row-identical to the plain inner join, duplicates and null keys included") {
    import graft.operators.Joins
    val rnd = new scala.util.Random(41)
    // skewed facts (key 5 hot), duplicate dim keys, null keys both sides
    val facts = (0 until 400).map { i =>
      (i.toLong, if (i % 53 == 0) null
       else java.lang.Long.valueOf(if (rnd.nextInt(3) > 0) 5L else rnd.nextInt(20).toLong))
    }.toDF("fid", "k")
    val dim = (0 until 30).map { i =>
      (if (i % 11 == 0) null else java.lang.Long.valueOf(rnd.nextInt(20).toLong),
        i.toLong)
    }.toDF("k", "did")
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("fid", "k", "did").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val plain = rowsOf(facts.join(dim, Seq("k")))
    for (nSalt <- Seq(1, 8)) {
      assert(rowsOf(Joins.saltedJoin(facts, dim, "k", nSalt)) === plain,
        s"nSalt=$nSalt")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(facts.withColumn("did", lit(1L)), dim, "k", 4)
    }
  }

  test("zValue matches the reference Morton interleave, boundaries included") {
    import graft.operators.Compact
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1)))
    val rnd = new scala.util.Random(47)
    val bits = 8
    val pts = Seq((0L, 0L), (255L, 255L), (0L, 255L), (255L, 0L)) ++
      (0 until 200).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), Compact.zValue(col("a"), col("b"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) === morton(a, b, bits), s"($a,$b)")
    }
  }

  test("z-order compaction bounds per-file ranges on BOTH dimensions") {
    import graft.operators.Compact
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder-spec").toString
    // full 64×64 grid — a single-key sort on x would leave every file's
    // y range at the full domain (63)
    val df = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    df.repartition(16).write.mode("overwrite").parquet(s"$tmp/frag")
    val fragBytes = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.startsWith("part-")) f.length else 0L
      walk(new java.io.File(s"$tmp/frag"))
    }
    val stats = Compact.compactParquetZOrder(spark, s"$tmp/frag", s"$tmp/out",
      "x", "y", targetBytes = fragBytes / 8 + 1, bits = 6)
    assert(stats.rows === 4096L, "rows preserved")
    val back = spark.read.parquet(s"$tmp/out")
    assert(back.select("id").collect().map(_.getLong(0)).toSet ===
      (0L until 4096L).toSet, "content preserved")
    val ranges = back.select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f").agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length >= 4, s"too few files: ${ranges.length}")
    // a contiguous Morton range that crosses a high-order curve boundary
    // can legitimately span one full dimension, so the claim is
    // distributional, not worst-case: MOST files are bounded on BOTH
    // dims, and the mean range of EACH dim is far below the domain —
    // a single-key x-sort leaves yr = 63 for EVERY file
    val boxed = ranges.count { case (xr, yr) => xr <= 48 && yr <= 48 }
    assert(boxed * 2 >= ranges.length,
      s"most files should bound both dims: ${ranges.toSeq}")
    val meanXr = ranges.map(_._1).sum.toDouble / ranges.length
    val meanYr = ranges.map(_._2).sum.toDouble / ranges.length
    assert(meanXr < 50.0 && meanYr < 50.0,
      s"not clustered in both dims: mean ($meanXr, $meanYr) of ${ranges.toSeq}")
    // degenerate inputs must degrade, not crash: an all-null dimension
    // collapses to coordinate 0 (regression pin for the eager getDouble)
    val nullDim = (0 until 50)
      .map(i => (i.toLong, null.asInstanceOf[java.lang.Long], (i % 8).toLong))
      .toDF("id", "x", "y")
    nullDim.write.mode("overwrite").parquet(s"$tmp/nullfrag")
    val st2 = Compact.compactParquetZOrder(spark, s"$tmp/nullfrag",
      s"$tmp/nullout", "x", "y", targetBytes = 1L << 20, bits = 4)
    assert(st2.rows === 50L)
    // internal column guard (the shared Layout.clusteredWriteByKey core)
    intercept[IllegalArgumentException] {
      df.withColumn("__zkey", lit(1L)).write.mode("overwrite").parquet(s"$tmp/zfrag")
      Compact.compactParquetZOrder(spark, s"$tmp/zfrag", s"$tmp/zout", "x", "y")
    }
  }

  test("percentileGlobal equals the driver-computed nearest-rank across widths") {
    import graft.operators.Profile
    val rnd = new scala.util.Random(53)
    val vals = (0 until 700).map(_ => rnd.nextInt(1000).toLong)
    val df = (vals.map(v => Some(v)) ++ Seq(None, None)).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(java.lang.Long.valueOf).orNull) }
      .toDF("id", "v").repartition(16)
    val sorted = vals.sorted
    def nearest(p: Int): Long = sorted(((p.toLong * vals.size + 99) / 100 - 1).toInt)
    for (w <- Seq(1, 3, 8)) {
      val row = Profile.percentileGlobal(df, "v", Seq(50, 90, 99), width = w).head()
      assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
        ((nearest(50), nearest(90), nearest(99))), s"width=$w")
    }
    // empty input → one all-null row (the oracle's aggregate-over-empty)
    val empty = Profile.percentileGlobal(df.where(lit(false)), "v").collect()
    assert(empty.length === 1 && empty.head.isNullAt(0) && empty.head.isNullAt(2))
  }

  test("capPerGroup keeps exactly the seeded-md5 rank prefix per group") {
    import graft.operators.Sampling
    val df = (0 until 300).map(i => (i.toLong, s"s${i % 7}")).toDF("doc_id", "g")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = (0 until 300).map(i => (i.toLong, s"s${i % 7}"))
      .groupBy(_._2).flatMap { case (_, rows) =>
        rows.sortBy { case (id, _) => (md5hex(s"42:$id"), id) }.take(10)
      }.map(_._1).toSet
    val kept = Sampling.capPerGroup(df, "g", "doc_id", n = 10, seed = "42")
      .collect().map(_.getLong(0)).toSet
    assert(kept === expected)
    // a different seed redraws; groups smaller than n keep everything
    val kept7 = Sampling.capPerGroup(df, "g", "doc_id", n = 10, seed = "7")
      .collect().map(_.getLong(0)).toSet
    assert(kept7 !== kept, "new seed must redraw the kept set")
    assert(Sampling.capPerGroup(df, "g", "doc_id", n = 1000, seed = "42").count()
      === 300L)
  }

  test("columnProfileApprox tracks the exact profile within sketch tolerance") {
    import graft.operators.Profile
    val df = (0 until 2000)
      .map(i => (i.toLong, s"v${i % 317}", if (i % 13 == 0) null else s"w${i % 5}"))
      .toDF("id", "a", "b")
    val exact = Profile.columnProfile(df, Seq("id", "a", "b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Profile.columnProfileApprox(df, Seq("id", "a", "b"), rsd = 0.02)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (c, (nNull, nDist)) =>
      val (aNull, aDist) = approx(c)
      assert(aNull === nNull, s"$c null counts stay exact")
      assert(math.abs(aDist - nDist) <= math.max(3L, (nDist * 0.06).toLong),
        s"$c distinct estimate $aDist vs exact $nDist")
    }
  }

  test("rollupGrains reports every prefix grain with the standard bitmask") {
    import graft.operators.Profile
    val df = Seq(("a", "en", 10L), ("a", "fr", 20L), ("b", "en", 5L),
      (null, "en", 1L)).toDF("src", "lang", "v")
    val out = Profile.rollupGrains(df, Seq("src", "lang"), "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out === Set(
      ("a", "en", 0, 1L, 10L), ("a", "fr", 0, 1L, 20L), ("b", "en", 0, 1L, 5L),
      ("(all)", "en", 0, 1L, 1L),           // REAL null key: gid stays 0
      ("a", "(all)", 1, 2L, 30L), ("b", "(all)", 1, 1L, 5L),
      ("(all)", "(all)", 1, 1L, 1L),        // rolled lang under the null key
      ("(all)", "(all)", 3, 4L, 36L)))      // grand total: gid=3
  }

  test("histogram buckets by exact integer arithmetic; edges land inside") {
    import graft.operators.Profile
    val df = (0L to 100L).toDF("v")
    val h = Profile.histogram(df, "v", nb = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(h.keySet === (0L to 9L).toSet)
    assert(h(0L) === ((11L, 0L, 10L)), "0..10 → bucket 0 ((v*10) div 101)")
    assert(h(9L)._3 === 100L, "max value pinned into the last bucket")
    assert(h.values.map(_._1).sum === 101L)
    // constant column → one bucket-0 bar, no division blow-up
    val const = Profile.histogram(Seq(7L, 7L, 7L).toDF("v"), "v", nb = 10)
      .collect()
    assert(const.length === 1 && const.head.getLong(0) === 0L
      && const.head.getLong(1) === 3L)
    assert(Profile.histogram(df.where(lit(false)), "v", 5).count() === 0L)
  }

  test("hourlyUsersApprox tracks exact distinct users within sketch tolerance") {
    val ev = (0 until 4000).map { i =>
      (i.toLong, (i % 700).toLong, (i % 3).toLong * 3600000000000L + i)
    }.toDF("event_id", "user_id", "ts")
    val exact = ev.groupBy(expr("ts div 3600000000000").as("hour_bucket"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Events.hourlyUsersApprox(ev, "user_id", rsd = 0.02)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (h, n) =>
      assert(math.abs(approx(h) - n) <= math.max(3L, (n * 0.06).toLong),
        s"hour $h: est ${approx(h)} vs exact $n")
    }
  }

  test("scd2Merge: close+reopen on change, untouched otherwise, chains across merges") {
    import graft.operators.Incremental
    def hist(rows: Seq[(Long, String, Long, Option[Long])]) =
      rows.map { case (k, a, f, t) => (k, a, f, t.map(java.lang.Long.valueOf).orNull) }
        .toDF("id", "attr", "valid_from", "valid_to")
    val h0 = hist(Seq(
      (1L, "a", 0L, None),            // will change
      (2L, "b", 0L, None),            // update arrives, identical → untouched
      (3L, "c", 0L, None),            // absent from batch → untouched
      (4L, "old", 0L, Some(50L)),     // closed history: must pass through
      (4L, "d", 50L, None),           // current row of a key with history
      (5L, null, 0L, None)))          // null attr → value is a CHANGE (null-safe)
    val u = Seq((1L, "a2"), (2L, "b"), (5L, "e"), (6L, "f")).toDF("id", "attr")
    val out = Incremental.scd2Merge(h0, u, "id", Seq("attr"), asOf = 100L)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got === Set(
      (1L, "a", 0L, Some(100L)), (1L, "a2", 100L, None),
      (2L, "b", 0L, None),
      (3L, "c", 0L, None),
      (4L, "old", 0L, Some(50L)), (4L, "d", 50L, None),
      (5L, null, 0L, Some(100L)), (5L, "e", 100L, None),
      (6L, "f", 100L, None)))
    // second merge chains a third version; exactly one open row per key
    val u2 = Seq((1L, "a3")).toDF("id", "attr")
    val out2 = Incremental.scd2Merge(out, u2, "id", Seq("attr"), asOf = 200L)
    val v1 = out2.where(col("id") === 1L).collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(v1 === Set(("a", 0L, Some(100L)), ("a2", 100L, Some(200L)),
      ("a3", 200L, None)))
    val opens = out2.where(col("valid_to").isNull).groupBy("id").count()
      .collect().map(_.getLong(1))
    assert(opens.forall(_ === 1L), "exactly one open row per key")
    // time travel over the same chain: boundary semantics are
    // [valid_from, valid_to) — at EXACTLY the version time the NEW
    // attrs show; one instant before, the old
    def attrAt(t: Long): String = Incremental.scd2AsOf(out2, t)
      .where(col("id") === 1L).head().getString(1)
    assert(attrAt(99L) === "a" && attrAt(100L) === "a2")
    assert(attrAt(199L) === "a2" && attrAt(200L) === "a3")
    // a key first seen at 100 is absent from the t=50 snapshot
    assert(Incremental.scd2AsOf(out2, 50L).where(col("id") === 6L).count() === 0L)
  }

  test("scd2Merge: NULL-key rows carry losslessly on both sides (presence markers)") {
    // regression (r11 ADVICE): `c.key IS NULL` misread a NULL-key open
    // history row as brand-new and rewrote it from the absent update
    // side as an all-null row — attrs and valid_from silently lost
    import graft.operators.Incremental
    val h0 = Seq((java.lang.Long.valueOf(7L), "kept", 0L, null: java.lang.Long),
        (null: java.lang.Long, "nullkey-attrs", 5L, null: java.lang.Long))
      .toDF("id", "attr", "valid_from", "valid_to")
    val u = Seq((java.lang.Long.valueOf(7L), "kept"),
        (null: java.lang.Long, "nullkey-new"))
      .toDF("id", "attr")
    val out = Incremental.scd2Merge(h0, u, "id", Seq("attr"), asOf = 100L)
    val got = out.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got === Set(
      (Some(7L), "kept", 0L, None),            // unchanged, untouched
      (None, "nullkey-attrs", 5L, None),       // NULL-key history: LOSSLESS
      (None, "nullkey-new", 100L, None)))      // NULL-key update opens its own line
  }

  test("mmrRerank diversifies duplicate hits; lambda=1 is plain top-k") {
    import graft.operators.Similarity
    // vec 1 and 2 are IDENTICAL and closest to q; vec 3 is orthogonal
    // (max marginal gain), vec 4 correlates with pick 1 (penalized);
    // plain top-2 = {1,2}, MMR top-2 = {1,3}
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.5f, 0.5f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Array(1.0f, 0.1f, 0.0f)
    val mmr = Similarity.mmrRerank(emb, "vec_id", "embedding", q,
      k = 2, lambda = 0.5, nCandidates = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(mmr(1) === 1L, "first pick is the cosine top-1")
    assert(mmr(2) === 3L, "second pick skips the duplicate of pick 1")
    val plain = Similarity.mmrRerank(emb, "vec_id", "embedding", q,
      k = 2, lambda = 1.0, nCandidates = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(plain === Map(1 -> 1L, 2 -> 2L), "λ=1 degenerates to cosine order")
    // k beyond the pool returns the whole pool, ranked
    val all = Similarity.mmrRerank(emb, "vec_id", "embedding", q,
      k = 10, lambda = 0.5, nCandidates = 4).collect()
    assert(all.length === 4 && all.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
  }

  test("klDivergence: corpus-matching group scores 0; skew scores positive") {
    import graft.operators.Profile
    // A skews en, B skews fr, C matches the corpus marginal exactly
    val rows =
      Seq.fill(8)(("A", "en")) ++ Seq.fill(2)(("A", "fr")) ++
      Seq.fill(2)(("B", "en")) ++ Seq.fill(8)(("B", "fr")) ++
      Seq.fill(5)(("C", "en")) ++ Seq.fill(5)(("C", "fr"))
    val df = rows.zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
      .toDF("id", "src", "lang")
    val got = Profile.klDivergence(df, "src", "lang")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // local recompute of the exact grid: N=30, n_c(en)=n_c(fr)=15
    def t6(nGc: Long, nG: Long, nC: Long): Long =
      math.floor(math.log((nGc.toDouble * 30) / (nG.toDouble * nC)) * 1e6).toLong
    def kl6(pairs: (Long, Long)*): Long = {
      val sw = pairs.map { case (nGc, nC) => nGc * t6(nGc, 10, nC) }.sum
      math.floor(sw.toDouble / 10).toLong
    }
    assert(got("C") === ((10L, 0L)), "p=q exactly -> ln(1)=0 on any engine")
    assert(got("A") === ((10L, kl6((8L, 15L), (2L, 15L)))))
    assert(got("A")._2 > 0L && got("B")._2 > 0L)
    assert(got("A")._2 === got("B")._2, "mirror skews score identically")
  }

  test("curriculumOrder: strata partition the score range; positions permute each stratum") {
    import graft.operators.Sampling
    val df = (0 until 100).map(i => (i.toLong, i.toLong * 10)).toDF("id", "score")
    val out = Sampling.curriculumOrder(df, "id", "score", nStrata = 4, seed = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bucket formula: ((score-0)*4) div 991 — kept in lockstep with a
    // local recompute
    out.foreach { case (_, sc, st, _) =>
      assert(st === sc * 4 / 991, s"score $sc") }
    // positions are 1..|stratum| inside every stratum
    out.groupBy(_._3).foreach { case (st, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length), s"stratum $st") }
    // same seed reproduces; a new seed redraws at least one stratum
    val again = Sampling.curriculumOrder(df, "id", "score", 4, "s")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out.map(r => r._1 -> r._4).toMap === again)
    val redrawn = Sampling.curriculumOrder(df, "id", "score", 4, "t")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(redrawn !== again)
  }

  test("mergeHourly(partials) equals the direct aggregate; fkOrphans counts nulls") {
    import graft.operators.Profile
    val ev = (0 until 500).map { i =>
      (i.toLong, (i % 3).toLong * 3600000000000L + i, s"t${i % 2}")
    }.toDF("event_id", "ts", "event_type")
    val direct = Events.hourlyGrain(ev, "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val merged = Events.mergeHourly("event_type",
        Events.hourlyGrain(ev.where(col("event_id") < 200), "event_type"),
        Events.hourlyGrain(ev.where(col("event_id") >= 200 && col("event_id") < 350), "event_type"),
        Events.hourlyGrain(ev.where(col("event_id") >= 350), "event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged === direct, "3-way partial merge must equal the direct aggregate")
    // fkOrphans: null child key is an orphan; dangling ref is an orphan
    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .map(v => Tuple1(v.map(java.lang.Long.valueOf).orNull)).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    val r = Profile.fkOrphans(child, "k", parent, "p").head()
    assert((r.getLong(0), r.getLong(1)) === ((4L, 2L)), "9 dangles + null = 2 orphans")
  }

  test("lengthBuckets partitions every doc exactly once") {
    val df = Seq((1L, "a b c"), (2L, "a b c d e"), (3L, ("t " * 40).trim))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lengthBuckets(df, "text", bucketWidth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).sum === 3L, "every doc in exactly one bucket")
    assert(out.map(_._3).sum === 3L + 5L + 40L, "token mass conserved")
    assert(out.find(_._1 === 0L).get._2 === 1L)   // 3 tokens → bucket 0
    assert(out.find(_._1 === 1L).get._2 === 1L)   // 5 tokens → bucket 1
    assert(out.find(_._1 === 10L).get._2 === 1L)  // 40 tokens → bucket 10
  }
}
