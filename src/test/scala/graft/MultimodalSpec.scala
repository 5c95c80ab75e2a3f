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
      // the synthetic "image" payloads are UTF-8 text, not a decodable
      // codec — the REAL decoder must yield null, never garbage
      assert(r.isNullAt(r.fieldIndex("image")))
    }
  }

  test("decodeImage: PNG and BMP round-trip exactly; garbage decodes to null") {
    // hand-built 2x2 image through both JDK encoders
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq((0, 0, 10, 20, 30), (1, 0, 0, 0, 255), (0, 1, 255, 255, 255), (1, 1, 1, 2, 3))
    px.foreach { case (x, y, r, g, b) => img.setRGB(x, y, (r << 16) | (g << 8) | b) }
    val expectedLuma = px.map { case (_, _, r, g, b) => 299L * r + 587L * g + 114L * b }.sum
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val rows = Seq(("png", enc("png")), ("bmp", enc("bmp")),
      ("garbage", "not an image at all".getBytes("UTF-8")))
      .toDF("fmt", "bytes")
      .select($"fmt", Multimodal.decodeImage($"bytes").as("m")).collect()
    rows.foreach { r =>
      if (r.getString(0) == "garbage") assert(r.isNullAt(1))
      else {
        val m = r.getStruct(1)
        assert(m.getInt(0) === 2 && m.getInt(1) === 2, s"${r.getString(0)} dims")
        assert(m.getLong(2) === expectedLuma, s"${r.getString(0)} luma")
        assert(m.getLong(3) === 4L)
      }
    }
  }

  test("resizeImage: nearest-neighbor source lookup; identity resize is lossless; garbage is null") {
    val d = Seq((9L, 16, 12, 5, 4)).toDF("id", "sw", "sh", "w", "h")
      .select($"id", $"sw", $"sh", $"w", $"h",
        Multimodal.decodeImage(Multimodal.resizeImage(
          Multimodal.synthPng($"id", $"sw", $"sh"), $"w", $"h")).as("m"),
        Multimodal.decodeImage(Multimodal.resizeImage(
          Multimodal.synthPng($"id", $"sw", $"sh"), $"sw", $"sh")).as("same"))
      .head()
    val (id, sw, sh, w, h) = (d.getLong(0), d.getInt(1), d.getInt(2), d.getInt(3), d.getInt(4))
    val m = d.getStruct(5)
    def luma(x: Long, y: Long): Long =
      299L * ((id * 31 + x * 7 + y * 13) % 256) +
      587L * ((id * 17 + x * 11 + y * 3) % 256) +
      114L * ((id * 23 + x * 5 + y * 19) % 256)
    val expected = (for { x <- 0 until w; y <- 0 until h } yield
      luma(x.toLong * sw / w, y.toLong * sh / h)).sum
    assert(m.getInt(0) === w && m.getInt(1) === h && m.getLong(2) === expected)
    // identity resize samples every source pixel exactly once
    val same = d.getStruct(6)
    val full = (for { x <- 0 until sw; y <- 0 until sh } yield luma(x, y)).sum
    assert(same.getLong(2) === full)
    val bad = Seq(("x", "junk".getBytes("UTF-8"))).toDF("k", "b")
      .select(Multimodal.resizeImage($"b", lit(2), lit(2))).head()
    assert(bad.isNullAt(0))
  }

  test("decodeWav ∘ synthWav equals the PCM16 sample formula; non-audio is null") {
    val rows = Seq((3L, 50, 8000), (11L, 7, 16000)).toDF("id", "n", "rate")
      .select($"id", $"n", $"rate",
        Multimodal.decodeWav(Multimodal.synthWav($"id", $"n", $"rate")).as("m"))
      .collect()
    rows.foreach { r =>
      val (id, n, rate) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val m = r.getStruct(3)
      val expected = (0 until n).map(i =>
        math.abs(((id * 7919 + i.toLong * 104729) % 65536) - 32768)).sum
      assert(m.getInt(0) === rate && m.getInt(1) === 1)
      assert(m.getLong(2) === n.toLong && m.getLong(3) === expected, s"id=$id")
    }
    val bad = Seq(("x", "definitely not audio".getBytes("UTF-8"))).toDF("k", "b")
      .select(Multimodal.decodeWav($"b")).head()
    assert(bad.isNullAt(0))
    // STEREO: n_samples counts FRAMES (duration = n/rate must not
    // double), abs_sum covers every channel sample
    val nFrames = 10
    val pcm = new Array[Byte](nFrames * 2 * 2)
    var absSum = 0L
    for (i <- 0 until nFrames * 2) {
      val v = (100 * i - 500).toShort // mixed signs
      absSum += math.abs(v.toLong)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val st = Seq(("s", bos.toByteArray)).toDF("k", "b")
      .select(Multimodal.decodeWav($"b").as("m")).head().getStruct(0)
    assert(st.getInt(1) === 2, "channels")
    assert(st.getLong(2) === nFrames.toLong, "frames, not channel-samples")
    assert(st.getLong(3) === absSum)
  }

  test("sampleFrames: frameSampleIndices math, per-frame decode formula, malformed strip is null") {
    val rows = Seq((5L, 6, 2), (8L, 2, 4)).toDF("id", "n", "k")
      .select($"id", $"n", $"k",
        Multimodal.sampleFrames(
          Multimodal.synthVideo($"id", $"n", lit(8), lit(6)), $"k").as("fs"))
      .collect()
    rows.foreach { r =>
      val (id, n, k) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val fs = r.getSeq[org.apache.spark.sql.Row](3)
      val expectIdx = if (n <= k) 0 until n else (0 until k).map(i => i * n / k)
      assert(fs.map(_.getInt(0)) === expectIdx, s"id=$id sampled indices")
      fs.foreach { f =>
        val fi = f.getInt(0)
        val eff = id * 100 + fi
        val expected = (for { x <- 0 until 8; y <- 0 until 6 } yield
          299L * ((eff * 31 + x * 7 + y * 13) % 256) +
          587L * ((eff * 17 + x * 11 + y * 3) % 256) +
          114L * ((eff * 23 + x * 5 + y * 19) % 256)).sum
        assert(f.getInt(1) === 8 && f.getInt(2) === 6)
        assert(f.getLong(3) === expected, s"id=$id frame=$fi")
      }
    }
    val bad = Seq(("x", Array[Byte](0, 0, 0, 99, 1, 2))).toDF("k", "b")
      .select(Multimodal.sampleFrames($"b", lit(2))).head()
    assert(bad.isNullAt(0), "truncated strip must be null")
  }

  test("decodeImage ∘ synthPng equals the integer pixel formula (the image_decode oracle contract)") {
    val d = Seq((5L, 9, 11), (12L, 16, 8)).toDF("id", "w", "h")
      .select($"id", $"w", $"h",
        Multimodal.decodeImage(Multimodal.synthPng($"id", $"w", $"h")).as("m"))
      .collect()
    d.foreach { r =>
      val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val m = r.getStruct(3)
      val expected = (for { x <- 0 until w; y <- 0 until h } yield
        299L * ((id * 31 + x * 7 + y * 13) % 256) +
        587L * ((id * 17 + x * 11 + y * 3) % 256) +
        114L * ((id * 23 + x * 5 + y * 19) % 256)).sum
      assert(m.getInt(0) === w && m.getInt(1) === h)
      assert(m.getLong(2) === expected, s"id=$id")
      assert(m.getLong(3) === w.toLong * h)
    }
  }
}
