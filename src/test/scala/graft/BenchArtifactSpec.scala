package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only a 2000-char stdout tail of the bench run and
  * json-parses what survives — Bench's final compact line must fit that
  * tail WHOLE at any realistic registry size, or the round loses its
  * bench artifact (BENCH_r01..r10 all recorded parsed:null). */
class BenchArtifactSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def mk(n: Int): Map[String, List[(Double, Option[String], Int)]] =
    (0 until n).map { i =>
      // realistic name lengths (registry mean is ~15 chars incl quotes)
      f"qry_name_$i%03d" -> List((i * 0.137 + 0.08, None: Option[String], 1))
    }.toMap

  test("compact line fits the tail and carries every measured query") {
    for (n <- Seq(90, 96, 110)) {
      val samples = mk(n)
      val line = Bench.compactJson(samples, samples.keys.toSeq, "/root/testdata/sf0.1")
      assert(line.length <= 1995, s"$n queries: ${line.length} chars")
      val tree = mapper.readTree(line)
      assert(tree.get("queries").size() === n, s"$n queries: rows dropped")
      assert(tree.get("metric").asText() === "total")
      assert(tree.get("sf").asDouble() === 0.1)
      assert(tree.get("value").asDouble() > 0)
    }
  }

  test("past the per-row capacity, slowest rows survive and the rest rolls up visibly") {
    // REAL registry names are ~16 chars; at 109+ the all-rows minimal
    // envelope exceeds the tail (measured 2135 at 109), so the ladder
    // must fall through to the slowest-rows + explicit-rest level
    val n = 130
    val samples = (0 until n).map { i =>
      f"realistically_long_query_name_$i%03d" -> List((i * 0.137 + 0.08, None: Option[String], 1))
    }.toMap
    val line = Bench.compactJson(samples, samples.keys.toSeq, "/root/testdata/sf0.1")
    assert(line.length <= 1995, s"${line.length} chars")
    val tree = mapper.readTree(line)
    val kept = tree.get("queries").size()
    assert(kept > 0 && kept < n)
    assert(tree.get("n_total").asInt() === n)
    assert(tree.get("rest_n").asInt() === n - kept, "truncation must be explicit")
    // the kept rows are the SLOWEST ones
    val names = tree.get("queries").fieldNames()
    val keptIdx = Iterator.continually(names).takeWhile(_ => names.hasNext)
      .map(_.next()).map(_.takeRight(3).toInt).toSet
    assert(keptIdx === ((n - kept) until n).toSet, "kept set is not the slowest tail")
    // total is conserved: rows + rest ≈ value
    val rowSum = {
      val it = tree.get("queries").elements(); var s = 0.0
      while (it.hasNext) s += it.next().asDouble(); s
    }
    assert(math.abs(rowSum + tree.get("rest_s").asDouble()
      - tree.get("value").asDouble()) < 0.5 + 0.05 * n)
  }

  test("the REAL registry's compact line parses inside the tail") {
    val names = Queries.all.keys.toSeq
    val samples = names.map(n => n -> List((1.3, None: Option[String], 1))).toMap
    val line = Bench.compactJson(samples, names, "/root/testdata/sf0.1")
    assert(line.length <= 1995, s"${names.length} real queries: ${line.length} chars")
    val tree = mapper.readTree(line)
    val covered =
      if (tree.has("n_total")) tree.get("queries").size() + tree.get("rest_n").asInt()
      else tree.get("queries").size()
    assert(covered === names.length, "every registered query accounted for")
  }

  test("extra fields (recall/golden/noise) ride the compact line at every ladder level") {
    // the golden twin is the REAL compact shape Bench emits (Golden
    // .scoreboard's second element) — pinned here at full realistic size
    val golden = """{"cat1":1.00,"phx":1.00,"narr":1.00,"phr":1.00,""" +
      """"ref":1.00,"xling":1.00,"cov":0.69}"""
    for (n <- Seq(96, 130)) {
      val samples = (0 until n).map { i =>
        f"realistically_long_query_name_$i%03d" -> List((i * 0.137 + 0.08, None: Option[String], 1))
      }.toMap
      val soak = """{"stage_r":0.8,"incr_r":1.8,"stream_r":1.6,"spill_mb":0,"trips":0,""" +
        """"ann_scan10":0.040,"ann_rec10":1.00,"ann_train_r":1.3}"""
      val line = Bench.compactJson(samples, samples.keys.toSeq, "/root/testdata/sf0.1",
        extra = s""""recall20_ann":0.43,"golden":$golden,"soak10x":$soak,"n_noisy":3,""")
      assert(line.length <= 1995, s"$n queries with extra: ${line.length} chars")
      val tree = mapper.readTree(line)
      assert(tree.get("recall20_ann").asDouble() === 0.43)
      assert(tree.get("golden").get("cov").asDouble() === 0.69)
      assert(tree.get("soak10x").get("trips").asInt() === 0)
      assert(tree.get("n_noisy").asInt() === 3)
    }
  }

  test("regressionsJson flags real movers and ex-rest-bucket entries, stays quiet on jitter") {
    val dir = java.nio.file.Files.createTempDirectory("bench-regr").toString
    // a driver-shaped prior artifact: top rows under parsed.queries,
    // fast rows rolled into the rest bucket (absent from the map)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/BENCH_r14.json"),
      """{"n":14,"parsed":{"queries":{"slow_q":4.1,"ok_q":2.0,"jitter_q":0.4}}}"""
        .getBytes("UTF-8"))
    // r13 decoy: the parser must pick the HIGHEST round
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/BENCH_r13.json"),
      """{"n":13,"parsed":{"queries":{"slow_q":99.0}}}""".getBytes("UTF-8"))
    val cur = Map(
      "slow_q" -> 7.2,     // +3.1 s and >1.5x: flagged
      "ok_q" -> 2.6,       // +0.6 s: under the 1 s bar — quiet
      "jitter_q" -> 0.9,   // >2x but sub-second delta — quiet
      "was_rest_q" -> 2.4, // no prior row, >=2 s: ex-rest-bucket mover
      "fast_q" -> 0.3)     // no prior row, small — quiet
    val tree = mapper.readTree(Bench.regressionsJson(cur, dir))
    assert(tree.get("base").asText() === "r14")
    val rows = tree.get("rows")
    assert(rows.size() === 2, s"unexpected rows: $rows")
    assert(rows.get("slow_q").get("prev").asDouble() === 4.1)
    assert(rows.get("slow_q").get("cur").asDouble() === 7.2)
    assert(rows.get("was_rest_q").get("prev").isNull)
    // no prior artifacts at all: null base, empty rows, no throw
    val empty = java.nio.file.Files.createTempDirectory("bench-regr-none").toString
    val t2 = mapper.readTree(Bench.regressionsJson(cur, empty))
    assert(t2.get("base").isNull && t2.get("rows").size() === 0)
  }

  test("regressionsJson keys lifecycle rows on the probe component (r17)") {
    val dir = java.nio.file.Files.createTempDirectory("bench-regr-lc").toString
    // prior round: build_q totals 6.0 s but its probe was 1.0 s
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/BENCH_r16.json"),
      ("""{"n":16,"parsed":{"queries":{"build_q":6.0,"plain_q":2.0},""" +
        """"lifecycle":{"build_q":{"b":5.0,"p":1.0}}}}""").getBytes("UTF-8"))
    // current round: total ballooned to 9.0 (build noise) but probe held
    // at 1.1 — with probe-keying this is NOT a mover
    val cur = Map("build_q" -> 9.0, "plain_q" -> 2.1)
    val quiet = mapper.readTree(Bench.regressionsJson(cur, dir,
      probe = Map("build_q" -> 1.1)))
    assert(quiet.get("rows").size() === 0, s"build noise flagged: $quiet")
    // a REAL probe regression (1.0 → 3.5) is flagged on the probe basis
    val hot = mapper.readTree(Bench.regressionsJson(cur, dir,
      probe = Map("build_q" -> 3.5)))
    assert(hot.get("rows").size() === 1)
    assert(hot.get("rows").get("build_q").get("prev").asDouble() === 1.0)
    assert(hot.get("rows").get("build_q").get("cur").asDouble() === 3.5)
    assert(hot.get("rows").get("build_q").get("basis").asText() === "probe")
    // prior artifact WITHOUT a lifecycle section: falls back to totals
    // (the first round after the split ships)
    val dir2 = java.nio.file.Files.createTempDirectory("bench-regr-lc2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir2/BENCH_r16.json"),
      """{"n":16,"parsed":{"queries":{"build_q":6.0}}}""".getBytes("UTF-8"))
    val fb = mapper.readTree(Bench.regressionsJson(Map("build_q" -> 9.0), dir2,
      probe = Map("build_q" -> 1.1)))
    assert(fb.get("rows").size() === 0) // 9.0 vs 6.0: under the 1.5x bar
    val fb2 = mapper.readTree(Bench.regressionsJson(Map("build_q" -> 12.0), dir2,
      probe = Map("build_q" -> 1.1)))
    assert(fb2.get("rows").get("build_q").get("prev").asDouble() === 6.0)
  }

  test("codegen cache floor tracks registry growth (r16 verdict #7)") {
    // the r16 eviction-cliff fix must not silently expire as the
    // registry grows: the session conf derives from registry size at
    // the measured ~75 classes/query rule, floored at the r16 value
    val n = SparkEntry.queries.size
    assert(GraftSession.CodegenCacheEntries >= n * 75,
      s"cache ${GraftSession.CodegenCacheEntries} under-sized for $n queries")
    assert(GraftSession.CodegenCacheEntries >= 12000)
  }

  test("failed queries are excluded from rows but counted") {
    val samples = mk(10) +
      ("broken_query" -> List((0.5, Some("boom"), 1), (0.6, Some("boom"), 2)))
    val line = Bench.compactJson(samples, samples.keys.toSeq, "/root/testdata/sf0.01")
    val tree = mapper.readTree(line)
    assert(tree.get("queries").size() === 10)
    assert(!tree.get("queries").has("broken_query"))
    assert(tree.get("n_failed").asInt() === 1)
  }
}
