package graft

import graft.functions.QueryFns
import org.apache.spark.sql.functions._

/** Router classifications per the reference's TEST_QUERIES.md categories,
  * plus the pin between the driver-side Router and the column-expression
  * QueryFns twin. */
class RouterSpec extends SparkSpec {
  import spark.implicits._

  test("classifications match reference categories") {
    assert(Router.route("Hadith narrated by Abu Hurairah").qtype === "narrator")
    assert(Router.route("book 3:12").qtype === "exact_reference")
    assert(Router.route("\"actions are by intentions\"").qtype === "thematic")
    assert(Router.route("patience and gratitude in hardship").qtype === "thematic")
    assert(Router.route("kindness").qtype === "mixed")
    assert(Router.route("forgiveness mercy").qtype === "mixed")
    assert(Router.route("عن أبي هريرة").qtype === "narrator")
  }

  test("narrator extraction canonicalizes honorifics and verbs") {
    val i = Router.route("narrated by Aisha (may Allah be pleased with her) about prayer")
    assert(i.narrator === Some("Aisha about prayer"))
    assert(Router.route("عن أبي هريرة").narrator === Some("أبي هريرة"))
  }

  test("fts match compilation (router.py:93-107 semantics)") {
    assert(Router.buildFtsMatch(Router.route("Hadith narrated by Abu Hurairah"))
      === "narrator:abu* AND narrator:hurairah*")
    assert(Router.buildFtsMatch(Router.route("\"actions are by intentions\""))
      === "\"actions are by intentions\"")
    assert(Router.buildFtsMatch(Router.route("forgiveness mercy"))
      === "forgiveness* AND mercy*")
  }

  test("exact-reference citations parse per HADITH_SEARCH_SPEC.md:246-287") {
    import Router.ExactRef
    // collection + global number, incl. the display-name → slug fold
    assert(Router.parseExactRef("Riyad as-Salihin 680")
      === Some(ExactRef(Some("riyadussalihin"), Some(680L), None, None)))
    assert(Router.parseExactRef("bukhari 52")
      === Some(ExactRef(Some("bukhari"), Some(52L), None, None)))
    // book/in-book pair, comma optional, case-insensitive
    assert(Router.parseExactRef("book 1, hadith 3")
      === Some(ExactRef(None, None, Some(1L), Some(3L))))
    assert(Router.parseExactRef("Book 12 Hadith 40")
      === Some(ExactRef(None, None, Some(12L), Some(40L))))
    // bare book:number (also - and / separators)
    assert(Router.parseExactRef("5:2") === Some(ExactRef(None, None, Some(5L), Some(2L))))
    assert(Router.parseExactRef("find 7/9 please")
      === Some(ExactRef(None, None, Some(7L), Some(9L))))
    // non-citations stay unparsed
    assert(Router.parseExactRef("patience and gratitude") === None)
    assert(Router.parseExactRef("2:255:1") === None)
  }

  test("lightStems: each suffix rule, its guards, and Arabic passthrough") {
    // suffix strips (coverage is substring-based, so stems are SHORTER)
    assert(Router.lightStems("praying").contains("pray"))
    assert(Router.lightStems("controlling").contains("control")) // undouble
    assert(Router.lightStems("stopped").contains("stop")) // ed + undouble
    assert(Router.lightStems("lying") === Seq("lie")) // len-5 ying special
    assert(Router.lightStems("charities").contains("charity"))
    assert(Router.lightStems("shyness") === Seq("shy"))
    assert(Router.lightStems("truthful") === Seq("truth"))
    assert(Router.lightStems("repentance").contains("repent"))
    assert(Router.lightStems("patience").contains("pati"))
    assert(Router.lightStems("sincerity").contains("sincer"))
    assert(Router.lightStems("promises").contains("promise"))
    assert(Router.lightStems("modesty").contains("modest"))
    assert(Router.lightStems("intentions").contains("intention"))
    // guards: ss/us/is plurals, length minimums, no sub-3-char stems
    assert(Router.lightStems("class") === Nil)
    assert(Router.lightStems("status") === Nil)
    assert(Router.lightStems("basis") === Nil)
    assert(Router.lightStems("bring") === Nil) // ing needs len >= 6
    assert(Router.lightStems("bed") === Nil) // ed needs len >= 5
    assert(!Router.lightStems("dies").exists(_.length < 3))
    // Arabic tokens carry no ASCII suffix -> unexpanded
    assert(Router.lightStems("الصبر") === Nil)
    // groups: token first, then stems; one group per token
    assert(Router.synonymGroups(Seq("praying", "الصبر")).map(_.head)
      === Seq("praying", "الصبر"))
    // serving decision point: quoted-phrase intents stay UNEXPANDED
    // (exact wording asked for), thematic intents expand
    val phr = Router.route("\"deeds are considered by the intentions\"")
    assert(phr.phrase.isDefined)
    assert(Router.coverageGroups(phr) === phr.tokens.map(Seq(_)))
    val thm = Router.route("hadith about controlling your anger")
    assert(thm.phrase.isEmpty)
    assert(Router.coverageGroups(thm).exists(_.size > 1))
  }

  test("column-expression twin agrees with driver-side Router on the battery") {
    val df = RouteBattery.queries.zipWithIndex.map { case (q, i) => (i, q) }.toDF("qid", "q")
      .select($"qid", $"q",
        QueryFns.intentType($"q").as("qtype"),
        QueryFns.stripQuotes($"q").as("normalized"),
        QueryFns.narrator(trim($"q")).as("narrator"),
        QueryFns.quotedPhrase($"q").as("phrase"),
        QueryFns.ftsMatch($"q").as("fts_match"))
      .orderBy("qid").collect()
    df.foreach { r =>
      val i = Router.route(r.getString(1))
      assert(r.getString(2) === i.qtype, s"qtype for '${r.getString(1)}'")
      assert(r.getString(3) === i.normalized, s"normalized for '${r.getString(1)}'")
      assert(Option(r.getString(4)) === i.narrator, s"narrator for '${r.getString(1)}'")
      assert(Option(r.getString(5)) === i.phrase, s"phrase for '${r.getString(1)}'")
      assert(r.getString(6) === Router.buildFtsMatch(i), s"match for '${r.getString(1)}'")
    }
  }
}
