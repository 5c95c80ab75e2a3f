package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (builder brief): media
  * ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample are per-partition transforms.
  *
  * The real decode needs image/audio codecs that are not in this build,
  * so `decodeStub` is a clearly-marked deterministic fake — but every
  * piece of Spark plumbing around it is real and tested: the schema, the
  * binary column handling, the partition-parallel transform shape, the
  * batch-friendly feature extraction (pure column expressions over
  * bytes), and the frame-sampling index math.
  */
object Multimodal {

  /** Canonical media-table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Wrap a text table into a synthetic media table (deterministic fake
    * payloads — UTF-8 bytes stand in for encoded media). */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol).cast("long") % 3 + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("bytes"),
      map(lit("codec"), lit("fake"), lit("source"), lit("synthetic")).as("meta"))

  /** STUB decode — deterministic fake in place of a codec: "dimensions"
    * parsed from the payload length, "duration" from a byte checksum.
    * A production build swaps ONLY this function for a real decoder
    * running in the same mapPartitions/column shape. */
  def decodeStub(bytes: Column): Column =
    struct(
      (length(bytes) % 1920).cast("int").as("width"),
      (length(bytes) % 1080).cast("int").as("height"),
      (crc32(bytes) % 3600).cast("double").as("duration_s"))

  /** Feature extraction that is REAL columnar work: a 64-bin byte
    * histogram over the payload, L2-normalized — the universal
    * cheap-embedding baseline for opaque bytes. Pure codegen-able
    * expressions; no UDF, no driver loop. */
  def byteHistogram(bytes: Column, bins: Int = 64): Column = {
    // bin index per byte straight off the binary (graft.plans.ByteBins —
    // the old hex()/regex-split/conv() route allocated 3 strings per byte)
    val entries = graft.plans.ByteBins(bytes, bins)
    val m = aggregate(entries, typedLit(Map.empty[Int, Double]), (acc, b) =>
      map_concat(
        map_filter(acc, (k, _) => k =!= b),
        map_from_arrays(array(b), array(coalesce(element_at(acc, b), lit(0.0)) + lit(1.0)))))
    val vec = transform(sequence(lit(0), lit(bins - 1)),
      d => coalesce(element_at(m, d.cast("int")), lit(0.0)))
    val n = sqrt(aggregate(vec, lit(0.0), (a, x) => a + x * x))
    transform(vec, x => when(n > 0, round(x / n, 6)).otherwise(lit(0.0)))
  }

  /** Scalable histogram form: explode bytes → groupBy (asset, bin) — the
    * shape for wide corpora (one shuffle, map-side combine). */
  def byteHistogramTable(media: DataFrame, bins: Int = 64): DataFrame =
    media.select(col("asset_id"),
        explode(graft.plans.ByteBins(col("bytes"), bins)).as("bin"))
      .groupBy("asset_id", "bin").agg(count("*").cast("double").as("v"))

  /** Frame-sampling index math (video): pick `k` evenly spaced frame
    * indices out of `nFrames` — the plumbing a real frame extractor
    * feeds. */
  def frameSampleIndices(nFrames: Column, k: Int): Column =
    when(nFrames <= 0, array())
      .when(nFrames <= k, sequence(lit(0), nFrames.cast("int") - 1))
      .otherwise(transform(sequence(lit(0), lit(k - 1)),
        i => floor(i.cast("double") * nFrames / k).cast("int")))

  /** Dense L2-normalized feature column — a NARROW per-row pass over the
    * payload via the native [[graft.plans.ByteHistogram]] (no explode, no
    * shuffle, no HOF). Empty payloads yield null, matching the old
    * sparse-table left-join shape. The ONE definition [[features]] and
    * [[enrich]] both use. */
  def featuresCol(bins: Int = 64): Column =
    when(length(col("bytes")) > 0,
      graft.plans.ByteHistogram(col("bytes"), bins, normalized = true))

  def features(media: DataFrame, bins: Int = 64): DataFrame =
    media.select(col("asset_id"), featuresCol(bins).as("features"))

  /** Full per-modality pipeline: decode (stub) + features + sampling —
    * ONE narrow select over the media table (no join, no shuffle),
    * embarrassingly parallel at any corpus size. */
  def enrich(media: DataFrame, bins: Int = 64, frames: Int = 8): DataFrame =
    media
      .withColumn("features", featuresCol(bins))
      .withColumn("decoded", decodeStub(col("bytes")))
      .withColumn("frame_idx",
        when(col("modality") === "video",
          frameSampleIndices((length(col("bytes")) % 240 + 1).cast("int"), frames))
          .otherwise(array()))
}
