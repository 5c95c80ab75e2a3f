package graft

import graft.functions.{Scoring, TextFns, VecFns}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5): score bounds, fusion
  * monotonicity, checksum stability, hash-family portability — checked on
  * the driver against the same column expressions evaluated through a
  * one-row frame where needed. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // scalacheck generators driven by a manual sample loop (the
  // scalatest/scalacheck bridge artifact is not on the offline classpath)
  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val scores = Gen.chooseNum(-2.0, 3.0)

  test("priority score stays in [0,1] for any signal combination") {
    for ((vs, bm, cov) <- samples(Gen.zip(scores, scores, Gen.chooseNum(0.0, 1.0)))) {
      val b = math.max(0.0, bm)
      val total = math.max(0.0, math.min(1.0,
        0.6 * math.max(0.0, math.min(1.0, vs)) +
          0.4 * math.max(0.0, math.min(1.0, b / (1.0 + b))) +
          0.2 * cov))
      assert(total >= 0.0 && total <= 1.0)
    }
  }

  test("Resident.roundHalfUp fast path equals the BigDecimal form (incl. boundaries)") {
    def slow(x: Double, sc: Int): Double =
      if (x.isNaN || x.isInfinite) x
      else BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gen = Gen.oneOf(
      Gen.chooseNum(-1e8, 1e8),
      Gen.chooseNum(-2.0, 2.0),
      // land on/near half-boundaries of both grids
      Gen.chooseNum(-2000000, 2000000).map(k => (k + 0.5) / 1e6),
      Gen.chooseNum(-20000, 20000).map(k => (k + 0.5) / 1e4),
      Gen.chooseNum(-2000000, 2000000).map(_ / 1e6),
      Gen.chooseNum(-2000000, 2000000).map(k => k / 1e6 + 1e-13),
      // tiny negatives that round to zero: the fast path must return
      // +0.0 (bit-compare below catches a -0.0 leak)
      Gen.chooseNum(1, 400000).map(k => -k / 1e12))
    for (x <- samples(gen, 4000); sc <- Seq(4, 6)) {
      val f = graft.operators.Resident.roundHalfUp(x, sc)
      val g = slow(x, sc)
      assert(java.lang.Double.compare(f, g) == 0,
        s"roundHalfUp($x, $sc): fast=$f slow=$g")
    }
    // out-of-table scales fall back to BigDecimal instead of crashing
    assert(graft.operators.Resident.roundHalfUp(1.23456789e-9, 8) ===
      slow(1.23456789e-9, 8))
    // column-expression cross-check: Spark round() on the same samples
    val xs = samples(gen, 200)
    val sparkRounded = xs.toDF("x")
      .select(round($"x", 6).as("r6"), round($"x", 4).as("r4"))
      .collect()
    xs.zip(sparkRounded).foreach { case (x, r) =>
      assert(graft.operators.Resident.roundHalfUp(x, 6) === r.getDouble(0), s"spark r6 $x")
      assert(graft.operators.Resident.roundHalfUp(x, 4) === r.getDouble(1), s"spark r4 $x")
    }
  }

  test("fusion total is monotone in each signal (column evaluation)") {
    val rows = Seq((0.2, 1.0, 0.3), (0.4, 1.0, 0.3), (0.4, 0.5, 0.3), (0.4, 0.5, 0.9))
      .toDF("vs", "bm25", "cov")
    val t = rows.select(Scoring.total(
      Scoring.vectorSignal($"vs"), Scoring.ftsSignal($"bm25"),
      lit(0.0), lit(0.0), $"cov", Scoring.Balanced).as("t"))
      .collect().map(_.getDouble(0))
    assert(t(1) > t(0)) // higher vector sim
    assert(t(1) > t(2)) // lower bm25 -> lower signal (increasing F9)
    assert(t(3) > t(2)) // higher coverage
  }

  test("hash31 column and local twin agree on arbitrary strings") {
    for (s <- samples(Gen.alphaNumStr.suchThat(_.nonEmpty), 20)) {
      val col31 = Seq(Tuple1(s)).toDF("x")
        .select(TextFns.hash31($"x")).head().getLong(0)
      assert(col31 === TextFns.hash31Local(s))
    }
  }

  test("checksum is stable under re-serialization (same fields, same hash)") {
    for ((a, b) <- samples(Gen.zip(Gen.alphaStr, Gen.alphaStr), 10)) {
      val df = Seq((a, b), (a, b)).toDF("x", "y")
        .select(TextFns.checksum($"x", $"y").as("c")).distinct()
      assert(df.count() === 1)
    }
  }

  test("hashEmbed local twin: vector norm equals sqrt of token count parity sum") {
    for (toks <- samples(Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta")), 20)) {
      val v = VecFns.hashEmbedLocal(toks, 16)
      // sum of |v| entries == signed sums; total token mass preserved mod cancellation
      assert(v.map(math.abs).sum <= toks.length.toDouble + 1e-9)
      assert((v.map(math.abs).sum - toks.length) % 2 == 0 ||
        math.abs(v.map(math.abs).sum % 2 - toks.length % 2) < 1e-9)
    }
  }

  test("keepBest is idempotent for any key ordering") {
    val docs = (1L to 50L).map(i => (i, s"g${i % 7}", i * 31 % 17)).toDF("id", "g", "rank")
    val once = graft.operators.Dedup.keepBest(docs, $"g", Seq(desc("rank"), asc("id")))
    val twice = graft.operators.Dedup.keepBest(once, $"g", Seq(desc("rank"), asc("id")))
    assert(once.collect().toSet === twice.collect().toSet)
    assert(once.count() === 7)
  }

  test("ScriptCounts byte scan matches the regex character-class counts") {
    def regexCount(cls: String) =
      length($"s") - length(regexp_replace($"s", cls, ""))
    // class boundaries: U+4DFF/U+A000 just outside CJK, U+4E00/U+9FFF
    // inclusive; U+05FF/U+0700 outside Arabic; astral chars in no class
    val rows = Seq("", "abcXYZ123", "نص عربي", "中文漢字", "䷿一鿿ꀀ",
      "׿؀ۿ܀", "mixed نص 中 ab 😀🎉", "é ß ñ 𝕏")
    val df = rows.toDF("s").select(
      graft.plans.ScriptCounts($"s").as("sc"),
      regexCount("[؀-ۿ]").as("ar"), regexCount("[一-鿿]").as("cjk"),
      regexCount("[a-zA-Z]").as("latin"))
    df.collect().foreach { r =>
      val sc = r.getStruct(0)
      assert(sc.getLong(0) === r.getInt(1).toLong, s"ar mismatch in $r")
      assert(sc.getLong(1) === r.getInt(2).toLong, s"cjk mismatch in $r")
      assert(sc.getLong(2) === r.getInt(3).toLong, s"latin mismatch in $r")
    }
  }

  test("ClassTokens byte scan is bit-identical to the regex tokenizer") {
    val regexForm = filter(split(lower($"s"), graft.functions.TextFns.TokenSep),
      t => length(t) > lit(0))
    def check(rows: Seq[String]): Unit = {
      val df = rows.toDF("s").select(
        graft.functions.TextFns.tokens($"s").as("fast"), regexForm.as("slow"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"on input row $r")
      }
    }
    // adversarial: case folding, Arabic block boundaries (U+0600/U+06FF
    // inclusive, U+05FF/U+0700 exclusive), emoji (4-byte), CJK (3-byte),
    // digits/underscore, empty, separator-only, mixed runs
    check(Seq("", "   ", "Hello World", "HELLO_under_score42",
      "نص عربي ومِثال", "؀start ۿend ׿out ܀out",
      "emoji 😀 mixed中文 text", "a؟b،c", "tab\tnl\ncr\r", "ÉÀ K ſ İ",
      "a1_؀ۿz9", "٠١٢٣ arabic digits", "x".repeat(3) + "؟" * 2))
    // real corpora: the sf documents table and a tafsir sample
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select($"text".as("s")).limit(200)
    val mism = docs.select(
        graft.functions.TextFns.tokens($"s").as("fast"), regexForm.as("slow"))
      .where(not($"fast" === $"slow")).count()
    assert(mism === 0)
  }

  test("stripRepeats equals the naive per-doc reference on random small-alphabet corpora") {
    // tiny alphabet + long docs force heavy, overlapping repeats — the
    // regime where off-by-one in the covered-union arithmetic would show
    val rnd = new scala.util.Random(23)
    val n = 3
    val docs = (0 until 120).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar.toString)
        .mkString(" "))
    }
    def naive(text: String): (String, Long) = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      val grams = (0 to t.length - n).map(j => t.slice(j, j + n).mkString("_"))
      val seen = scala.collection.mutable.Set.empty[String]
      val dup = scala.collection.mutable.Set.empty[Int]
      grams.zipWithIndex.foreach { case (g, j0) =>
        if (seen.contains(g)) dup ++= (j0 + 1 to j0 + n) // 1-based cover
        else seen += g
      }
      val clean = t.zipWithIndex.collect {
        case (tok, i0) if !dup.contains(i0 + 1) => tok }
      (clean.mkString(" "), dup.size.toLong)
    }
    val got = graft.operators.TextAnalysis
      .stripRepeats(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === naive(text), s"doc $id: '$text'")
    }
  }

  test("chunkDocs: full coverage, exact overlap, reconstruction from stride prefixes") {
    val lens = samples(Gen.chooseNum(0, 120), n = 25)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w$j").mkString(" "))
    }
    val (len, stride) = (16, 11)
    val got = graft.operators.Shards
      .chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text", len, stride)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val chunks = got.getOrElse(id, Array()).sortBy(_._2)
      if (toks.isEmpty) assert(chunks.isEmpty, s"doc $id: empty doc must chunk to nothing")
      else {
        val expectStarts = 0 until toks.length by stride
        assert(chunks.map(_._2).toSeq === expectStarts.indices, s"doc $id chunk ids")
        chunks.zip(expectStarts).foreach { case ((_, _, c, n), s) =>
          val want = toks.slice(s, s + len)
          assert(c === want.mkString(" "), s"doc $id chunk at $s")
          assert(n === want.length.toLong)
        }
        // reconstruction: the first `stride` tokens of every chunk (all
        // of the last) concatenate back to the original token stream
        val rebuilt = chunks.init.flatMap(_._3.split(" ").take(stride)) ++
          chunks.last._3.split(" ")
        assert(rebuilt.toSeq === toks.toSeq, s"doc $id reconstruction")
      }
    }
  }

  test("zorderKey2 is a bijection on the grid: the key decodes back to (a, b)") {
    val bits = 12
    val pairs = samples(for {
      a <- Gen.chooseNum(0L, (1L << bits) - 1)
      b <- Gen.chooseNum(0L, (1L << bits) - 1)
    } yield (a, b), n = 80)
    val keys = pairs.toDF("a", "b")
      .select(graft.operators.Layout.zorderKey2($"a", $"b", bits))
      .collect().map(_.getLong(0))
    // driver-side de-interleave: even bits → a, odd bits → b
    def dez(z: Long): (Long, Long) = {
      var (a, b, k) = (0L, 0L, 0)
      while (k < bits) {
        a |= ((z >> (2 * k)) & 1L) << k
        b |= ((z >> (2 * k + 1)) & 1L) << k
        k += 1
      }
      (a, b)
    }
    pairs.zip(keys).foreach { case ((a, b), z) =>
      assert(dez(z) === ((a, b)), s"z=$z must decode to ($a, $b)")
    }
    // distinct inputs → distinct keys (injective on the sample)
    assert(keys.distinct.length === pairs.distinct.length)
  }
}
