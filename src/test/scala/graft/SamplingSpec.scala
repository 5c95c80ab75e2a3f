package graft

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the properties the sampling/PII oracles can't isolate: sample
  * nesting, split totality, quota exactness under ties, mix replication
  * counts, and PII pattern edge behavior (SSN-vs-phone precedence, no
  * cross-match bleed). */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  test("hash sample: deterministic, rate-monotone nested, never rand()") {
    val d = ids(1000)
    val s3 = Sampling.sampleByHash(d, "doc_id", 3, 10).collect().map(_.getLong(0)).toSet
    val s3b = Sampling.sampleByHash(d, "doc_id", 3, 10).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.sampleByHash(d, "doc_id", 2, 10).collect().map(_.getLong(0)).toSet
    assert(s3 === s3b, "same key set on re-run")
    assert(s2.subsetOf(s3), "rate 2/10 nests inside 3/10")
    // uniformity sanity: 3/10 of 1000 within a generous band
    assert(s3.size > 200 && s3.size < 400, s"rate off: ${s3.size}")
  }

  test("splits: total, deterministic, ~80/10/10") {
    val byCell = Sampling.assignSplits(ids(1000), "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCell.values.sum === 1000L, "every row assigned")
    assert(byCell("train") > 700 && byCell("train") < 900)
    assert(byCell("val") > 50 && byCell("val") < 160)
    assert(byCell("test") > 50 && byCell("test") < 160)
  }

  test("stratified sample: exact quota per stratum, short strata intact") {
    import spark.implicits._
    val d = (0L until 100L).map(i => (i, if (i < 90) "big" else "small"))
      .toDF("doc_id", "stratum")
    val got = Sampling.stratifiedSample(d, "doc_id", "stratum", 15)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("big" -> 15L, "small" -> 10L))
  }

  test("stratified sample: hot stratum matches naive window exactly; window input pre-thinned") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 20k-row hot stratum vs tiny strata — the skew shape the threshold
    // pre-thinning exists for
    val d = (0L until 20000L)
      .map(i => (i, if (i % 1000 == 0) "rare" else if (i % 997 == 0) "mid" else "hot"))
      .toDF("doc_id", "stratum")
    val got = Sampling.stratifiedSample(d, "doc_id", "stratum", 7)
    val w = Window.partitionBy("stratum")
      .orderBy(Sampling.hashKey(col("doc_id")), col("doc_id"))
    val naive = d.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 7).drop("rk")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(got) === rows(naive),
      "pre-thinned output must be byte-identical to the unthinned window")
    assert(got.columns.toSeq === Seq("doc_id", "stratum"), "input column layout restored")
    // plan pin: the hash-threshold filter is in the executed plan feeding
    // the rank window — the sort input is bounded per stratum, not the
    // raw corpus (the round-8 hot-stratum finding). The window sits at
    // the top of this plan, so any __gsp_hk<__gsp_thr Filter is below it.
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a rank window in:\n$plan")
    // Catalyst pushes the threshold into the broadcast-join condition
    // (`cast(__gsp_hk as double) < __gsp_thr`) rather than a standalone
    // Filter — accept either form, same guarantee
    assert("__gsp_hk#\\d+L?[^\\n]* < __gsp_thr".r.findFirstIn(plan).isDefined,
      s"no hash-threshold predicate feeding the rank window:\n$plan")
  }

  test("stratified sample: under-filled-stratum fallback keeps exactness at tiny safety") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // safety so small the threshold keeps ~1 row where quota needs 50 —
    // the Binomial tail fires for sure and EVERY stratum must route
    // through the full-rows fallback, still matching the naive window
    val d = (0L until 5000L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "stratum")
    val got = Sampling.stratifiedSample(d, "doc_id", "stratum", 50, safety = 0.001)
    val w = Window.partitionBy("stratum")
      .orderBy(Sampling.hashKey(col("doc_id")), col("doc_id"))
    val naive = d.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 50).drop("rk")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(got) === rows(naive))
  }

  test("mix sources: Σ w(s)·|s| replicas, epoch 1..w, unweighted dropped") {
    import spark.implicits._
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "zz"))
      .toDF("doc_id", "source")
    val rows = Sampling.mixSources(d, "source", Map("a" -> 3, "b" -> 1, "c" -> 9))
      .select("doc_id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows === Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (2L, 3), (3L, 1)))
  }

  test("sqrt-temperature sample: biggest source keeps all, rates scale by √size") {
    import spark.implicits._
    // source a: 64 docs, source b: 16 docs (√ ratio 1/2), source c: 4 (1/4)
    val d = ((0 until 64).map(i => (i.toLong, "a")) ++
      (100 until 116).map(i => (i.toLong, "b")) ++
      (200 until 204).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val out = Sampling.sqrtTemperatureSample(d, "doc_id", "source")
    val rates = out.select("source", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("a") === 1.0)
    assert(rates("b") === 0.5)
    assert(rates("c") === 0.25)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") === 64L, "rate-1 source keeps every row")
    assert(kept.getOrElse("b", 0L) <= 16L)
    // reproducibility: the kept set is a pure function of the data
    val again = Sampling.sqrtTemperatureSample(d, "doc_id", "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === out.select("doc_id").collect().map(_.getLong(0)).toSet)
    // exactness: kept iff h60(doc_id) < floor(rate·2^60), per row
    val h = d.select(col("doc_id"), Sampling.hashKey(col("doc_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = d.collect().map(r => (r.getLong(0), r.getString(1))).filter {
      case (id, s) =>
        val rate = Map("a" -> 1.0, "b" -> 0.5, "c" -> 0.25)(s)
        h(id) < math.floor(rate * math.pow(2, 60)).toLong
    }.map(_._1).toSet
    assert(again === expected)
  }

  test("negativePairs: deterministic, self-free, ≤k per anchor, partitioning-invariant") {
    import graft.operators.Sampling
    import spark.implicits._
    val d = spark.range(0L, 60L).selectExpr("id as doc_id", "concat('t', id) as text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.negativePairs(df, "doc_id", k = 3, nBuckets = 8, seed = "t")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val a = run(d)
    assert(a === run(d), "two runs differ — RNG leaked into the ring")
    assert(a === run(d.repartition(7)), "result depends on physical partitioning")
    assert(a.forall { case (anchor, _, neg) => anchor != neg }, "self negative")
    val perAnchor = a.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ <= 3), "more than k probes emitted")
    // with 60 docs over 8 buckets no probed bucket is empty-or-self-only
    assert(perAnchor.size === 60 && perAnchor.values.forall(_ === 3),
      "dense ring should yield exactly k rows per anchor")
    // probes draw from DIFFERENT buckets most of the time: the negatives
    // are not one global constant (ring collapse would break training)
    assert(a.map(_._3).size > 8, "negatives collapsed to a tiny set")
  }

  test("PII: redaction order (SSN before phone), counts don't cross-match") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a.b+c@x-y.co ip 10.0.0.1 ssn 123-45-6789 tel +1 555-0123 ok"),
      (2L, "no pii here, just words and 42 numbers 7.5")).toDF("doc_id", "text")
    val red = d.select(col("doc_id"), TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) === "mail <EMAIL> ip <IP> ssn <SSN> tel <PHONE> ok",
      "ssn redacted as SSN, not eaten by the phone pattern")
    assert(red(2L) === "no pii here, just words and 42 numbers 7.5",
      "bare numbers / decimals untouched")
    val st = TextAnalysis.piiStats(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(st(1L) === ((1L, 1L, 1L, 1L)))
    assert(st(2L) === ((0L, 0L, 0L, 0L)))
  }
}
