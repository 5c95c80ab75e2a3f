package graft

import graft.functions.Scoring
import org.apache.spark.sql.functions._

/** Fusion math F9/F12/F14/A5 including the clamp quirks
  * (reference: mcp_server/apps/scoring.py:36-106). */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  private def one(vs: Option[Double], bm: Option[Double], text: String,
                  phrase: Option[String], toks: Seq[String]): (Double, Double, Double, Double, Double) = {
    val r = Seq((vs, bm, text, phrase, toks)).toDF("vs", "bm25", "text", "phrase", "tokens")
      .select(
        Scoring.vectorSignal($"vs").as("v"),
        Scoring.ftsSignal($"bm25").as("f"),
        Scoring.phraseBonus($"text", $"phrase", 0.05).as("pb"),
        Scoring.termCoverage($"text", $"tokens").as("cov"),
        Scoring.total(Scoring.vectorSignal($"vs"), Scoring.ftsSignal($"bm25"),
          Scoring.phraseBonus($"text", $"phrase", 0.05), lit(0.0),
          Scoring.termCoverage($"text", $"tokens"), Scoring.Balanced).as("t"))
      .head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
  }

  test("vector similarity clamps to [0,1], null -> 0") {
    assert(one(Some(1.7), None, "", None, Nil)._1 === 1.0)
    assert(one(Some(-0.3), None, "", None, Nil)._1 === 0.0)
    assert(one(None, None, "", None, Nil)._1 === 0.0)
  }

  test("fts signal is increasing in bm25, floors negatives, null -> 0 (F9)") {
    assert(one(None, Some(-1.2), "", None, Nil)._2 === 0.0) // negative floors to 0
    assert(one(None, Some(4.0), "", None, Nil)._2 === 0.8) // 4/(1+4)
    assert(one(None, Some(1.5), "", None, Nil)._2 === 0.6) // 1.5/2.5
    assert(one(None, None, "", None, Nil)._2 === 0.0)
    // monotone: stronger lexical match => larger signal
    assert(one(None, Some(4.0), "", None, Nil)._2 > one(None, Some(0.1), "", None, Nil)._2)
  }

  test("parity mode makes every FTS match signal exactly 1.0") {
    val r = Seq((Some(3.0), 1)).toDF("bm25", "x")
      .select(Scoring.ftsSignal($"bm25", parity = true)).head().getDouble(0)
    assert(r === 1.0)
  }

  test("phrase bonus is substring-based and case-insensitive") {
    assert(one(None, None, "The Quick Brown fox", Some("quick brown"), Nil)._3 === 0.05)
    assert(one(None, None, "The Quick Brown fox", Some("missing"), Nil)._3 === 0.0)
  }

  test("term coverage is fraction of tokens found as substrings") {
    val (_, _, _, cov, _) = one(None, None, "half and half", None, Seq("half", "and", "xyz"))
    assert(math.abs(cov - 2.0 / 3) < 1e-12)
  }

  test("group coverage: a group hits when ANY member is a substring (scoring.py:60-67)") {
    def covG(text: String, groups: Seq[Seq[String]]): Double =
      Seq((text, groups)).toDF("text", "groups")
        .select(Scoring.termCoverageGroups($"text", $"groups").as("c"))
        .head().getDouble(0)
    // stem member rescues a token miss; unexpanded miss stays a miss
    assert(math.abs(covG("the prayer of the believer",
      Seq(Seq("praying", "pray"), Seq("zzz"))) - 0.5) < 1e-12)
    // groups >= tokens fallback: singleton groups reproduce termCoverage
    assert(math.abs(covG("half and half",
      Seq(Seq("half"), Seq("and"), Seq("xyz"))) - 2.0 / 3) < 1e-12)
    // empty groups -> 0
    assert(covG("anything", Nil) === 0.0)
    // synonymGroups end-to-end: expansion can only raise coverage
    val toks = Seq("praying", "virtue")
    val plain = covG("the prayer is a virtue", toks.map(Seq(_)))
    val expanded = covG("the prayer is a virtue", Router.synonymGroups(toks))
    assert(plain === 0.5 && expanded === 1.0)
  }

  test("total is weighted sum clamped to [0,1]") {
    val (_, _, _, _, t) = one(Some(0.82), Some(1.5), "the quick brown fox jumps",
      Some("brown fox"), Seq("quick", "fox"))
    // 0.6*0.82 + 0.4*0.6 + 0.05 + 0.2*1.0 = 0.982
    assert(math.abs(t - 0.982) < 1e-12)
    val (_, _, _, _, tMax) = one(Some(1.0), Some(9.0), "a b", Some("a b"), Seq("a", "b"))
    assert(tMax === 1.0) // 0.6+0.4*0.9+0.05+0.2 = 1.21 clamped
  }
}
