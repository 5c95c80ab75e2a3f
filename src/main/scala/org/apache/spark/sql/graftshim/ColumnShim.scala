package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 moved the Expression↔Column conversions behind
  * private[sql] (classic.ExpressionUtils); extension libraries reach
  * them from an org.apache.spark.sql subpackage — the established
  * pattern for third-party expression packages. */
object ColumnShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Re-root a CACHED frame at its InMemoryRelation leaf. Spark analyzes
    * eagerly on every Dataset transformation, walking the whole logical
    * tree each time; a resident serving index composed over deep
    * derivation trees (scan→explode→union→groupBy…) pays that walk on
    * every per-query operator even though execution reads the cache.
    * Substituting the cached plan once turns each index layer into a
    * LEAF, so per-query analysis touches only the few query nodes on
    * top. No-op for uncached frames (withCachedData = analyzed plan).
    * Lifecycle note: the returned frame pins the cache entry — if the
    * entry is later unpersisted, execution rebuilds the buffer from the
    * InMemoryRelation's retained child plan rather than re-resolving. */
  def reroot(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.withCachedData)

  /** Row→InternalRow converter for a schema — lets a driver-resident
    * lookup cache pre-convert its rows ONCE (the conversion is
    * query-independent, like a store's on-disk format) instead of
    * re-converting fat rows on every request inside createDataFrame. */
  def internalConverter(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Row => org.apache.spark.sql.catalyst.InternalRow = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    r => conv(r).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
  }

  /** DataFrame over an explicit LocalRelation of pre-converted rows —
    * the per-call work is one leaf-plan QueryExecution + collect, the
    * honest per-request cost of serving through the SQL engine. */
  def localDf(spark: org.apache.spark.sql.SparkSession,
              schema: org.apache.spark.sql.types.StructType,
              rows: Seq[org.apache.spark.sql.catalyst.InternalRow])
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        rows))
}
