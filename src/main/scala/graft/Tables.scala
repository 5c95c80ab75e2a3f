package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst's column pruning and
  * filter pushdown reach the files; at cluster scale these would be
  * partitioned tables, and the same code works unchanged.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // the driver has generated this table both as TIMESTAMP(NANOS)
      // (Spark 4 reads it only via the legacy long mapping) and as
      // TIMESTAMP(MICROS) (reads natively as a timestamp). Normalize
      // both storage types to the canonical `ts` every downstream query
      // works in: epoch NANOS as a long. The timestamp→long conversion
      // pins UTC so a non-UTC session cannot shift NTZ values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      df.schema("ts").dataType match {
        case LongType => df
        case _ => df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The events table as a STREAMING source (file source over the same
    * parquet), with the identical ts normalization as the batch loader —
    * epoch NANOS as a long. Used by the registered stream_* queries so a
    * real micro-batch execution consumes exactly the oracle's input. At
    * cluster scale the same code points at an arriving-files directory. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val sch = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the fixture table is a single FILE; the streaming file source
    // lists a directory, so stream the SF dir filtered to this table
    // (a cluster layout would be a directory of arriving files)
    val df = spark.readStream.schema(sch)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
    sch("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
  }

  /** The documents table as a STREAMING source — [[eventsStream]]'s
    * pattern for the text corpus (no column normalization needed).
    * Single fixture file ⇒ one micro-batch per AvailableNow run, the
    * batching contract the stream_* oracles rely on. */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val sch = spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream.schema(sch)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
  }
}
