package graft

import graft.functions.ServeFns
import org.apache.spark.sql.functions._

class ServeFnsSpec extends SparkSpec {
  import spark.implicits._

  test("html unescape handles named, decimal and hex entities (F19)") {
    val f = ServeFns.htmlUnescapeFn
    assert(f("a &amp; b &lt;c&gt; &quot;d&quot;") === "a & b <c> \"d\"")
    assert(f("x &#39;s and &#x627;") === "x 's and ا")
    assert(f("untouched &unknown; stays") === "untouched &unknown; stays")
    assert(f(null) === null)
  }

  test("snippet highlight marks matches in a bounded window (T6)") {
    val f = ServeFns.snippetHighlightFn(8)
    val text = (1 to 40).map(i => s"w$i").mkString(" ") + " target " + (41 to 80).map(i => s"w$i").mkString(" ")
    val out = f(text, Seq("target"))
    assert(out.contains("[target]"))
    assert(out.startsWith("...") && out.endsWith("..."))
    assert(out.split("\\s+").length <= 10) // window + ellipses
    // prefix-term marking
    assert(ServeFns.snippetHighlightFn(8)("modesty matters", Seq("modest*")).contains("[modesty]"))
  }

  test("proximity bonus fires only within the window (F13)") {
    val df = Seq(
      (Seq("eat", "x", "drink"), Seq("eat"), Seq("drink")),      // dist 2 <= 5
      (Seq("eat") ++ (1 to 10).map(_.toString) ++ Seq("drink"), Seq("eat"), Seq("drink")), // dist 11 > 5
      (Seq("nothing", "here"), Seq("eat"), Seq("drink"))
    ).toDF("toks", "g0", "g1")
    val out = df.select(ServeFns.proximityBonus($"toks", $"g0", $"g1", 5, 0.10)).collect()
      .map(_.getDouble(0))
    assert(out === Array(0.10, 0.0, 0.0))
  }

  test("is_arabic ratio and match quoting (F22/F27)") {
    val r = Seq(("السلام عليكم", "hello world ك")).toDF("ar", "en")
      .select(ServeFns.isArabic($"ar"), ServeFns.isArabic($"en")).head()
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
    assert(ServeFns.matchQuote("single") === "single")
    assert(ServeFns.matchQuote("two words") === "\"two words\"")
  }
}
