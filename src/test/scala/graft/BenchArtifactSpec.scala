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
