package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (the reference's hybrid_search lifecycle,
    * mcp_server/tools.py:39-175) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Hybrid.search(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", Queries.HybridQuery, n = 10, dim = Queries.Dim)
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Oracles.all
}
