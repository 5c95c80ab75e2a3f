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

  test("decodeVideo (AVI leg): header metadata round-trips; junk and truncated AVIs are null") {
    val rows = Seq((4L, 5), (9L, 3)).toDF("id", "n")
      .select($"id", $"n",
        Multimodal.decodeVideo(Multimodal.synthAvi($"id", $"n", lit(8), lit(6))).as("m"))
      .collect()
    rows.foreach { r =>
      val m = r.getStruct(2)
      assert(m.getInt(0) === 8 && m.getInt(1) === 6, "header dims")
      assert(m.getInt(2) === r.getInt(1), "movi frame count")
      // 100000 µs/frame → n/10 seconds, exactly
      assert(m.getDouble(3) === r.getInt(1) * 100000L / 1e6)
    }
    val junk = Seq(("x", "RIFFxxxxJUNK".getBytes("UTF-8")),
      ("y", "not even riff".getBytes("UTF-8"))).toDF("k", "b")
      .select(Multimodal.decodeVideo($"b")).collect()
    junk.foreach(r => assert(r.isNullAt(0)))
    // a well-formed AVI truncated mid-chunk must be null, not garbage
    val whole = Seq((1L, 1)).toDF("id", "n")
      .select(Multimodal.synthAvi($"id", $"n", lit(8), lit(6))).head().getAs[Array[Byte]](0)
    val cut = Seq(("t", whole.take(whole.length / 2))).toDF("k", "b")
      .select(Multimodal.decodeVideo($"b")).head()
    assert(cut.isNullAt(0), "truncated AVI must be null")
  }

  test("demuxAvi handles a genuine MJPG AVI (lossy JPEG frames through the same container)") {
    // real JPEG payloads via the JDK encoder — proves the demuxer is
    // codec-agnostic, not an MPNG-shaped parser
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 6) img.setRGB(x, y, (x * 30 << 16) | (y * 40 << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    // the public fixture path writes MPNG; tag this one MJPG with real
    // JPEG payloads (the sampleFrames UDF then decodes the JPEGs)
    val avi = Multimodal.aviBytes(Seq(jpeg, jpeg, jpeg), 8, 6, 100000, "MJPG")
    val fs = Seq(("a", avi)).toDF("k", "b")
      .select(Multimodal.sampleFrames($"b", lit(2)).as("fs"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(fs.map(_.getInt(0)) === Seq(0, 1), "sampled indices over 3 frames, k=2")
    fs.foreach { f =>
      assert(f.getInt(1) === 8 && f.getInt(2) === 6, "JPEG frame dims")
      assert(f.getLong(3) > 0L, "non-trivial decoded luma")
    }
  }

  test("decodeVideo (MP4 leg): ISO-BMFF metadata round-trips; junk and truncated MP4s are null") {
    val rows = Seq((4L, 5), (9L, 3)).toDF("id", "n")
      .select($"id", $"n",
        Multimodal.decodeVideo(Multimodal.synthMp4($"id", $"n", lit(8), lit(6))).as("m"))
      .collect()
    rows.foreach { r =>
      val m = r.getStruct(2)
      assert(m.getInt(0) === 8 && m.getInt(1) === 6, "tkhd 16.16 dims")
      assert(m.getInt(2) === r.getInt(1), "stsz sample count")
      // 10 Hz timescale × 1-tick delta → n/10 seconds, exactly the AVI clock
      assert(m.getDouble(3) === r.getInt(1) * 100000L / 1e6)
    }
    // junk with a plausible ftyp prefix, and a well-formed MP4 truncated
    // mid-moov, must both be null — not garbage, not an exception
    val whole = Seq((1L, 2)).toDF("id", "n")
      .select(Multimodal.synthMp4($"id", $"n", lit(8), lit(6))).head().getAs[Array[Byte]](0)
    val bad = Seq(
      ("junk", "....ftypisom but then nonsense".getBytes("UTF-8")),
      ("cut", whole.take(whole.length - 40))).toDF("k", "b")
      .select(Multimodal.decodeVideo($"b")).collect()
    bad.foreach(r => assert(r.isNullAt(0)))
  }

  test("one container, one oracle: synthAvi and synthMp4 demux to identical sampled frames") {
    val pairs = Seq((7L, 5, 2), (12L, 3, 4)).toDF("id", "n", "k")
      .select($"id",
        Multimodal.sampleFrames(Multimodal.synthAvi($"id", $"n", lit(8), lit(6)), $"k").as("avi"),
        Multimodal.sampleFrames(Multimodal.synthMp4($"id", $"n", lit(8), lit(6)), $"k").as("mp4"))
      .collect()
    pairs.foreach { r =>
      val avi = r.getSeq[org.apache.spark.sql.Row](1)
      val mp4 = r.getSeq[org.apache.spark.sql.Row](2)
      assert(avi.nonEmpty && avi === mp4,
        s"id=${r.getLong(0)}: the two containers must carry the same frames")
    }
  }

  test("demuxMp4 handles a genuine JPEG-sample MP4 (lossy frames through the same box walker)") {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 6) img.setRGB(x, y, (x * 30 << 16) | (y * 40 << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val mp4 = Multimodal.mp4Bytes(Seq(jpeg, jpeg, jpeg), 8, 6,
      timescale = 30L, delta = 3L, fourcc = "jpeg")
    val fs = Seq(("a", mp4)).toDF("k", "b")
      .select(Multimodal.sampleFrames($"b", lit(2)).as("fs"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(fs.map(_.getInt(0)) === Seq(0, 1), "sampled indices over 3 frames, k=2")
    fs.foreach { f =>
      assert(f.getInt(1) === 8 && f.getInt(2) === 6, "JPEG frame dims")
      assert(f.getLong(3) > 0L, "non-trivial decoded luma")
    }
    // the 30 Hz / 3-tick clock is still exactly 100 000 µs per frame
    val m = Seq(("a", mp4)).toDF("k", "b")
      .select(Multimodal.decodeVideo($"b").as("m")).head().getStruct(0)
    assert(m.getDouble(3) === 0.3)
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

  test("enrich composes REAL decode + features + sampling per modality") {
    // realMedia: id 0 → PNG image (8×8), 1 → WAV audio (65 samples @
    // 8 kHz), 2 → MPNG AVI video (5 frames, 8×6, 10 fps)
    val rm = Multimodal.realMedia(
      Seq(0L, 1L, 2L).toDF("doc_id"), "doc_id")
    val e = Multimodal.enrich(rm, bins = 16, frames = 4)
      .collect().map(r => r.getAs[String]("modality") -> r).toMap
    assert(e.size === 3)
    e.values.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("features")).length === 16)
    }
    val img = e("image").getStruct(e("image").fieldIndex("decoded"))
    assert(img.getInt(0) === 8 && img.getInt(1) === 8 && img.getDouble(2) === 0.0)
    val aud = e("audio").getStruct(e("audio").fieldIndex("decoded"))
    assert(aud.isNullAt(0) && aud.isNullAt(1))
    assert(aud.getDouble(2) === 65.0 / 8000)
    val vid = e("video").getStruct(e("video").fieldIndex("decoded"))
    assert(vid.getInt(0) === 8 && vid.getInt(1) === 6)
    assert(vid.getDouble(2) === 5 * 100000L / 1e6)
    // frame schedule over the TRUE demuxed frame count (5 frames, k=4)
    assert(e("video").getSeq[Int](e("video").fieldIndex("frame_idx")) ===
      Seq(0, 1, 2, 3).map(i => i * 5 / 4))
    assert(e("image").getSeq[Int](e("image").fieldIndex("frame_idx")).isEmpty)
    // an UNDECODABLE payload yields null decode legs, never garbage
    val bad = Multimodal.enrich(
      Seq((9L, "video", "not an avi".getBytes("UTF-8"), Map("codec" -> "fake")))
        .toDF("asset_id", "modality", "bytes", "meta"), bins = 16).head()
    assert(bad.isNullAt(bad.fieldIndex("video")))
    assert(bad.getSeq[Int](bad.fieldIndex("frame_idx")).isEmpty)
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

  test("sampleFrames: frameSampleIndices math, per-frame decode formula, malformed AVI is null") {
    val rows = Seq((5L, 6, 2), (8L, 2, 4)).toDF("id", "n", "k")
      .select($"id", $"n", $"k",
        Multimodal.sampleFrames(
          Multimodal.synthAvi($"id", $"n", lit(8), lit(6)), $"k").as("fs"))
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
    assert(bad.isNullAt(0), "non-AVI bytes must be null")
  }

  test("resampleWav: stride decimation formula, factor-1 round trip, junk is null") {
    import spark.implicits._
    val rows = Seq((7L, 70, 3), (9L, 65, 1)).toDF("id", "n", "k")
      .select($"id", $"n", $"k",
        Multimodal.decodeWav(Multimodal.resampleWav(
          Multimodal.synthWav($"id", $"n", lit(8000)), $"k")).as("m"))
      .collect()
    rows.foreach { r =>
      val (id, n, k) = (r.getLong(0), r.getInt(1), r.getInt(2))
      val m = r.getStruct(3)
      assert(m.getInt(0) === 8000 / k, "decimated rate")
      assert(m.getLong(2) === (n + k - 1) / k, "kept frame count")
      val expected = (0 until n by k).map(i =>
        math.abs(((id * 7919 + i.toLong * 104729) % 65536) - 32768)).sum
      assert(m.getLong(3) === expected, s"id=$id stride-$k |sample| sum")
    }
    val bad = Seq(("x", "not audio at all".getBytes("UTF-8"))).toDF("kk", "b")
      .select(Multimodal.resampleWav($"b", lit(2))).head()
    assert(bad.isNullAt(0), "non-WAV bytes must be null")
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
