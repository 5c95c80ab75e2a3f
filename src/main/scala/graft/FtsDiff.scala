package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential-test driver for the MATCH grammar (r17): evaluates a
  * file of MATCH queries over the fixed five-doc corpus (the same one
  * FtsMatchSpec pins) and emits one JSON line per query —
  * `{"q":…,"ok":…,"rows":[rowids]}` or `{"q":…,"ok":false,"err":…}` —
  * for `tools/fts5_diff.py` to compare against SQLite FTS5 itself
  * running the SAME queries on the SAME corpus. Candidate-SET parity
  * is the contract (ranking divergence is documented/accepted, so the
  * harness compares row sets, not order, and error-ness, not message
  * text). Usage: runMain graft.FtsDiff <queries.txt> <out.jsonl> */
object FtsDiff {
  /** The shared corpus, in rowid order (sqlite rowids 1..5). */
  val Corpus: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a quick dog barks at the brown cat",
    "foxes are quick and dogs are lazy",
    "the cat sat on the mat",
    "quick words travel far and quick deeds farther")

  def main(args: Array[String]): Unit = {
    val Array(inPath, outPath) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Corpus.zipWithIndex
      .map { case (t, i) => (1, i + 1, s"1:${i + 1}", t) }
      .toDF("surah", "ayah", "verse_key", "text_plain")
    val idx = operators.Quran.buildIndex(corpus, None)
    val queries = scala.io.Source.fromFile(inPath, "UTF-8").getLines().toSeq
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val out = queries.map { q =>
      operators.FtsMatch.parse(q) match {
        case Left(e) => s"""{"q":"${esc(q)}","ok":false,"err":"${esc(e)}"}"""
        case Right(ast) =>
          val rows = operators.FtsMatch.candidates(idx, ast)
            .select((pmod(col("doc_id"), lit(1000))).cast("int").as("r"))
            .collect().map(_.getInt(0)).sorted.distinct
          s"""{"q":"${esc(q)}","ok":true,"rows":[${rows.mkString(",")}]}"""
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      out.mkString("\n").getBytes("UTF-8"))
    println(s"[ftsdiff] ${queries.size} queries evaluated -> $outPath")
    spark.stop()
  }
}
