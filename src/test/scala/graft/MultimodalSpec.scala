package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world payload"), (2L, "another fake asset"), (3L, "binary stand in bytes")
  ).toDF("doc_id", "text")
  private lazy val media = Multimodal.syntheticMedia(docs, "doc_id", "text")

  test("media table carries binary payloads with typed metadata") {
    val r = media.collect()
    assert(r.length === 3)
    assert(r.map(_.getAs[String]("modality")).toSet.subsetOf(Set("image", "audio", "video")))
    assert(r.forall(_.getAs[Array[Byte]]("bytes").nonEmpty))
    assert(r.forall(_.getAs[Map[String, String]]("meta")("codec") == "fake"))
  }

  test("byte histogram is L2-normalized and matches the table form") {
    val dense = media.select($"asset_id", Multimodal.byteHistogram($"bytes", 16).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // norm ≈ 1
    dense.values.foreach { h =>
      assert(math.abs(math.sqrt(h.map(x => x * x).sum) - 1.0) < 1e-3)
    }
    // table form agrees on raw counts
    val table = Multimodal.byteHistogramTable(media, 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val text1 = "hello world payload"
    val counts1 = text1.getBytes("UTF-8").groupBy(b => ((b & 0xff) % 16)).view.mapValues(_.length.toDouble)
    counts1.foreach { case (bin, c) => assert(table((1L, bin)) === c) }
  }

  test("decode stub is deterministic plumbing") {
    val d = media.select($"asset_id", Multimodal.decodeStub($"bytes").as("d")).collect()
    d.foreach { r =>
      val s = r.getStruct(1)
      assert(s.getInt(0) >= 0 && s.getInt(1) >= 0 && s.getDouble(2) >= 0.0)
    }
  }

  test("frame sampling picks k evenly spaced indices") {
    val r = Seq((100, 1), (4, 2), (0, 3)).toDF("n", "x")
      .select(Multimodal.frameSampleIndices($"n", 4)).collect().map(_.getSeq[Int](0))
    assert(r(0) === Seq(0, 25, 50, 75))
    assert(r(1) === Seq(0, 1, 2, 3)) // n <= k keeps every frame
    assert(r(2) === Seq())
  }

  test("dense normalized features match a hand-computed sparse normalization") {
    val got = Multimodal.features(media, bins = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    Seq((1L, "hello world payload"), (2L, "another fake asset"),
      (3L, "binary stand in bytes")).foreach { case (id, text) =>
      val counts = new Array[Double](16)
      text.getBytes("UTF-8").foreach(b => counts((b & 0xff) % 16) += 1.0)
      val n = math.sqrt(counts.map(x => x * x).sum)
      val want = counts.map(c => BigDecimal(c / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq
      assert(got(id) === want, s"asset $id")
    }
    // empty payload → null features (the sparse left-join shape)
    val empty = Multimodal.features(
      Seq((9L, Array.empty[Byte])).toDF("asset_id", "bytes"), 16).head()
    assert(empty.isNullAt(1))
  }

  test("enrich composes decode + features + sampling per modality") {
    val e = Multimodal.enrich(media, bins = 16, frames = 4).collect()
    assert(e.length === 3)
    e.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("features")).length === 16)
      val isVideo = r.getAs[String]("modality") == "video"
      val fi = r.getSeq[Int](r.fieldIndex("frame_idx"))
      assert(if (isVideo) fi.nonEmpty else fi.isEmpty)
    }
  }
}
