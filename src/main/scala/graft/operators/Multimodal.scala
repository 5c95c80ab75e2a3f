package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (builder brief): media
  * ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample are per-partition transforms.
  *
  * ALL THREE modalities decode for real with zero new dependencies
  * (r14 — no stand-ins remain): [[decodeImage]] reads PNG/BMP/JPEG/GIF
  * through the JDK's own ImageIO readers, [[decodeWav]] parses
  * RIFF/WAVE PCM16 through AudioSystem, and video rides a genuine
  * RIFF/AVI container — written by [[aviBytes]], walked back by the
  * pure-JDK [[demuxAvi]] (LIST recursion, even-byte padding, avih
  * header, '00dc' frame chunks), frames decoded per-sample through
  * ImageIO ([[sampleFrames]], [[decodeVideo]]). Each path is
  * oracle-checked end-to-end on deterministic fixtures ([[synthPng]] /
  * [[synthWav]] / [[synthAvi]] — integer generator formulas a SQL
  * oracle replays verbatim through lossless codecs).
  */
object Multimodal {

  /** Decoded-image metadata: exact-integer luma (`luma_sum` =
    * Σ 299r+587g+114b over pixels, undivided — the BT.601 integer
    * grid) so the value replays exactly in any engine; consumers divide
    * by `1000·n_px` for mean luma when they want a float. */
  case class ImageMeta(width: Int, height: Int, luma_sum: Long, n_px: Long)

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

  /** REAL image decode (licensed UDF — SURVEY §2.11: no builtin or
    * Expression can run a media codec; same license class as the Bloom
    * probe and html-unescape). JDK `ImageIO` reads PNG/BMP/JPEG/GIF with
    * zero new dependencies. Returns `null` for payloads no reader
    * accepts (corrupt bytes, other codecs) — callers branch or filter on
    * it. Per-row narrow work, embarrassingly parallel: at 100 TB the
    * decode rides in the scan projection (no shuffle, no state), and
    * binary payloads stream through one task at a time — executor memory
    * bounds the max SINGLE image, not the corpus. */
  val decodeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { bytes: Array[Byte] =>
      if (bytes == null) None
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          Some(ImageMeta(w, h, lumaOf(img), w.toLong * h))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** The ONE synthetic-pixel PNG encoder behind [[synthPng]] and
    * [[synthAvi]]: pixel (x, y) of image `id` is
    * r = (id·31 + x·7 + y·13) mod 256, g = (id·17 + x·11 + y·3) mod 256,
    * b = (id·23 + x·5 + y·19) mod 256. */
  private def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PNG fixture generator (licensed UDF, fixture-only):
    * [[pngBytes]]'s integer pixel formulas — pure arithmetic a SQL
    * oracle replays verbatim, and PNG is lossless, so
    * [[decodeImage]] ∘ [[synthPng]] is exactly the formula. This is how
    * the `image_decode` registered query gets REAL codec bytes out of
    * the relational testdata (the digest-style oracle pattern of
    * npz_embeddings). */
  val synthPng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, w: Int, h: Int) => pngBytes(id, w, h) }

  /** Σ BT.601 integer luma over a decoded image — the ONE pixel loop
    * [[decodeImage]] and [[sampleFrames]] share. */
  private def lumaOf(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    var s = 0L; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        s += 299L * ((p >> 16) & 255) + 587L * ((p >> 8) & 255) + 114L * (p & 255)
        x += 1
      }
      y += 1
    }
    s
  }

  // ── RIFF/AVI container (pure JDK, r14 — retires the length-prefixed
  //    strip AND the decodeStub: video now rides a REAL container) ────

  /** RIFF chunk: fourcc + little-endian size + payload + even pad. */
  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(id.getBytes("US-ASCII"))
    writeU32(bos, payload.length.toLong)
    bos.write(payload)
    if ((payload.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  /** RIFF LIST: "LIST" + size + list type + concatenated children. */
  private def riffList(typ: String, children: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("US-ASCII") ++ children)

  private def writeU32(bos: java.io.ByteArrayOutputStream, v: Long): Unit = {
    bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
    bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
  }

  private def u32Bytes(vs: Long*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    vs.foreach(writeU32(bos, _))
    bos.toByteArray
  }

  /** Minimal standard AVI writer: RIFF('AVI ') → LIST hdrl (avih +
    * LIST strl (strh 'vids' + strf BITMAPINFOHEADER)) → LIST movi
    * ('00dc' chunk per encoded frame, even-padded) → idx1. One video
    * stream; `fourcc` is the frame codec tag ('MJPG' for JPEG frames,
    * 'MPNG' for PNG frames — both are real registered handlers the
    * demuxer treats identically, since ImageIO sniffs the payload). */
  private[graft] def aviBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                              usPerFrame: Int, fourcc: String): Array[Byte] = {
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = u32Bytes(usPerFrame.toLong, 0L, 0L, 0x10L /*AVIF_HASINDEX*/,
      frames.length.toLong, 0L, 1L, maxFrame.toLong, w.toLong, h.toLong,
      0L, 0L, 0L, 0L)
    val strh = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("vids".getBytes("US-ASCII"))
      bos.write(fourcc.getBytes("US-ASCII"))
      writeU32(bos, 0L) // flags
      bos.write(0); bos.write(0); bos.write(0); bos.write(0) // prio + language
      writeU32(bos, 0L) // initial frames
      writeU32(bos, 1L) // scale
      writeU32(bos, (1000000L / math.max(1, usPerFrame))) // rate (fps)
      writeU32(bos, 0L) // start
      writeU32(bos, frames.length.toLong)
      writeU32(bos, maxFrame.toLong)
      writeU32(bos, 0L) // quality
      writeU32(bos, 0L) // sample size
      // rcFrame (left, top, right, bottom as LE u16s)
      bos.write(u32Bytes(0L, w.toLong | (h.toLong << 16)))
      bos.toByteArray
    }
    val strf = u32Bytes(40L, w.toLong, h.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ // planes=1, bitcount=24
      fourcc.getBytes("US-ASCII") ++
      u32Bytes(w.toLong * h * 3, 0L, 0L, 0L, 0L)
    val hdrl = riffList("hdrl",
      riffChunk("avih", avih) ++
        riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val moviChildren = frames.map(f => (riffChunk("00dc", f), f.length))
    val movi = riffList("movi", moviChildren.flatMap(_._1).toArray)
    // idx1: one entry per chunk, offsets counted from the 'movi' fourcc
    val idx1 = {
      val bos = new java.io.ByteArrayOutputStream()
      var off = 4L
      moviChildren.foreach { case (chunk, payloadLen) =>
        bos.write("00dc".getBytes("US-ASCII"))
        writeU32(bos, 0x10L) // AVIIF_KEYFRAME
        writeU32(bos, off)
        writeU32(bos, payloadLen.toLong)
        off += chunk.length
      }
      bos.toByteArray
    }
    riffChunk("RIFF",
      "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ riffChunk("idx1", idx1))
  }

  /** REAL RIFF/AVI demuxer (pure JDK): validates the RIFF('AVI ')
    * envelope, walks the chunk tree (LIST recursion, even-byte chunk
    * padding, idx1 skipped), reads the avih main header (µs/frame,
    * width, height at payload offsets 0/32/36), and collects every
    * video-frame chunk ('##dc'/'##db') payload in stream order.
    * Returns (width, height, µsPerFrame, frames) — None for anything
    * that is not a well-formed AVI. The frame payloads are whatever
    * the codec tag says (MJPG/MPNG → ImageIO decodes both). */
  private[operators] def demuxAvi(bytes: Array[Byte])
      : Option[(Int, Int, Long, Vector[Array[Byte]])] = {
    if (bytes == null || bytes.length < 12) return None
    def fourcc(o: Int) = new String(bytes, o, 4, "US-ASCII")
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var w = 0; var h = 0; var usf = -1L
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(p); val sz = u32(p + 4).toInt
        if (sz < 0 || p + 8 + sz > end) throw new java.io.IOException(s"bad chunk $id")
        if (id == "LIST") walk(p + 12, p + 8 + sz)
        else if (id == "avih") {
          if (sz < 40) throw new java.io.IOException("short avih")
          usf = u32(p + 8); w = u32(p + 40).toInt; h = u32(p + 44).toInt
        } else if (id.charAt(2) == 'd' && (id.charAt(3) == 'c' || id.charAt(3) == 'b') &&
          id.charAt(0).isDigit && id.charAt(1).isDigit)
          frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + sz)
        p += 8 + sz + (sz & 1)
      }
    }
    try {
      walk(12, math.min(bytes.length.toLong, 8L + u32(4)).toInt)
      if (usf < 0) None else Some((w, h, usf, frames.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic VIDEO fixture (licensed UDF, fixture-only): frame f
    * of clip `id` is [[pngBytes]] at effective id `id·100 + f`, carried
    * in a REAL RIFF/AVI container ([[aviBytes]], codec tag MPNG, 10
    * fps) — the r13 length-prefixed strip's one remaining stand-in
    * layer, retired. PNG frames keep the pixel formula lossless, so
    * the `video_frames` oracle replays the sampled lumas verbatim;
    * the demuxer itself is codec-agnostic (MJPG-tested in
    * MultimodalSpec). */
  val synthAvi: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, nFrames: Int, w: Int, h: Int) =>
      aviBytes((0 until nFrames).map(f => pngBytes(id * 100 + f, w, h)),
        w, h, usPerFrame = 100000, fourcc = "MPNG")
    }

  /** [[synthAvi]]'s MP4 twin (licensed UDF, fixture-only): the SAME
    * per-frame pixel formula (effective id `id·100 + f`, PNG-encoded)
    * carried in a REAL ISO-BMFF container ([[mp4Bytes]], 10 Hz
    * timescale × 1-tick delta = the same exact 100 000 µs/frame) — so
    * every oracle that replays the AVI fixture's numbers replays this
    * one's verbatim: two containers, one oracle. */
  val synthMp4: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, nFrames: Int, w: Int, h: Int) =>
      mp4Bytes((0 until nFrames).map(f => pngBytes(id * 100 + f, w, h)),
        w, h, timescale = 10L, delta = 1L, fourcc = "mpng")
    }

  // ── ISO-BMFF / MP4 container (pure JDK, r14 — the SECOND real video
  //    container: big-endian box tree vs RIFF's little-endian chunks,
  //    sample tables vs in-band '00dc' chunks; one demuxer API) ────────

  /** Big-endian u32s — ISO-BMFF's integer grid (RIFF is LE; [[u32Bytes]]
    * serves that side). */
  private def be32(vs: Long*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    vs.foreach { v =>
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
    }
    bos.toByteArray
  }

  private def be16(vs: Int*): Array[Byte] =
    vs.flatMap(v => Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)).toArray

  /** ISO-BMFF box: u32 size (incl. 8-byte header) + fourcc + payload. */
  private def bmffBox(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** ISO-BMFF full box: version byte + 24-bit flags prefix the payload. */
  private def bmffFull(typ: String, version: Int, flags: Int,
                       payload: Array[Byte]): Array[Byte] =
    bmffBox(typ, Array(version.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++ payload)

  /** Identity transform matrix (9 × 16.16/2.30 fixed) shared by
    * mvhd/tkhd. */
  private val bmffMatrix: Array[Byte] =
    be32(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)

  /** Minimal standard MP4 (ISO base media) writer: ftyp → mdat (frame
    * payloads back-to-back) → moov (mvhd + one 'vide' trak with the
    * full sample-table stack: stsd sample entry, stts timing, stsc
    * chunk map, stsz sizes, stco offsets). mdat-before-moov layout so
    * the ONE stco chunk offset is just |ftyp| + 8 — no fixups. `fourcc`
    * tags the visual sample entry ('jpeg' for JPEG frames, 'mpng' for
    * PNG — the demuxer is codec-agnostic; ImageIO sniffs payloads).
    * Clock: `delta` ticks per frame on a `timescale`-Hz track clock
    * (10 Hz × 1 tick = the fixtures' exact 100 000 µs/frame). */
  private[graft] def mp4Bytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                              timescale: Long, delta: Long,
                              fourcc: String): Array[Byte] = {
    val n = frames.length
    val dur = n.toLong * delta
    val ftyp = bmffBox("ftyp", "isom".getBytes("US-ASCII") ++ be32(0x200L) ++
      "isomiso2mp41".getBytes("US-ASCII"))
    val mdat = bmffBox("mdat", frames.foldLeft(Array.emptyByteArray)(_ ++ _))
    val mvhd = bmffFull("mvhd", 0, 0, be32(0, 0, timescale, dur, 0x10000L) ++
      be16(0x100, 0) ++ be32(0, 0) ++ bmffMatrix ++ be32(0, 0, 0, 0, 0, 0, 2))
    val tkhd = bmffFull("tkhd", 0, 7, be32(0, 0, 1, 0, dur, 0, 0) ++
      be16(0, 0, 0, 0) ++ bmffMatrix ++ be32(w.toLong << 16, h.toLong << 16))
    val mdhd = bmffFull("mdhd", 0, 0, be32(0, 0, timescale, dur) ++ be16(0x55c4, 0))
    val hdlr = bmffFull("hdlr", 0, 0, be32(0) ++ "vide".getBytes("US-ASCII") ++
      be32(0, 0, 0) ++ ("graft".getBytes("US-ASCII") :+ 0.toByte))
    val sampleEntry = bmffBox(fourcc,
      Array.fill[Byte](6)(0) ++ be16(1) ++ // reserved + data_reference_index
        be16(0, 0) ++ be32(0, 0, 0) ++ be16(w, h) ++
        be32(0x480000L, 0x480000L, 0) ++ be16(1) ++ // 72 dpi, frame_count
        Array.fill[Byte](32)(0) ++ be16(24) ++ be16(0xffff)) // depth, -1
    val stbl = bmffBox("stbl",
      bmffFull("stsd", 0, 0, be32(1) ++ sampleEntry) ++
        bmffFull("stts", 0, 0, be32(1, n.toLong, delta)) ++
        bmffFull("stsc", 0, 0, be32(1, 1, n.toLong, 1)) ++
        bmffFull("stsz", 0, 0, be32(0L +: n.toLong +: frames.map(_.length.toLong): _*)) ++
        bmffFull("stco", 0, 0, be32(1, ftyp.length + 8L)))
    val minf = bmffBox("minf",
      bmffFull("vmhd", 0, 1, be16(0, 0, 0, 0)) ++
        bmffBox("dinf", bmffFull("dref", 0, 0,
          be32(1) ++ bmffFull("url ", 0, 1, Array.emptyByteArray))) ++ stbl)
    val moov = bmffBox("moov", mvhd ++
      bmffBox("trak", tkhd ++ bmffBox("mdia", mdhd ++ hdlr ++ minf)))
    ftyp ++ mdat ++ moov
  }

  /** REAL ISO-BMFF/MP4 demuxer (pure JDK): walks the big-endian box
    * tree (u32 size, size 1 → 64-bit largesize, size 0 → to-end),
    * selects the first 'vide'-handler trak, reads dims from tkhd
    * (16.16 fixed, v0/v1), the clock from mdhd timescale + the first
    * stts delta, and reconstructs every sample's byte range from the
    * GENERAL sample tables — stsc chunk runs × stco/co64 chunk offsets
    * × stsz sizes — so multi-chunk files written by other muxers demux
    * too, not just [[mp4Bytes]]'s single-chunk layout. Returns the
    * same (width, height, µsPerFrame, frames) tuple as [[demuxAvi]];
    * None for anything that is not a well-formed MP4 video. */
  private[operators] def demuxMp4(bytes: Array[Byte])
      : Option[(Int, Int, Long, Vector[Array[Byte]])] = {
    if (bytes == null || bytes.length < 16) return None
    def u32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
      ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def bad(msg: String) = throw new java.io.IOException(msg)
    /** Children of a box span as (fourcc, payloadStart, payloadEnd). */
    def boxes(start: Int, end: Int): Vector[(String, Int, Int)] = {
      val b = Vector.newBuilder[(String, Int, Int)]
      var p = start
      while (p + 8 <= end) {
        val sz0 = u32(p)
        val typ = new String(bytes, p + 4, 4, "US-ASCII")
        val (ps, sz) =
          if (sz0 == 1L) { if (p + 16 > end) bad("short largesize"); (p + 16, u64(p + 8)) }
          else if (sz0 == 0L) (p + 8, (end - p).toLong)
          else (p + 8, sz0)
        if (sz < (ps - p) || p + sz > end) bad(s"bad box $typ")
        b += ((typ, ps, (p + sz).toInt))
        p = (p + sz).toInt
      }
      b.result()
    }
    def one(cs: Vector[(String, Int, Int)], t: String): (Int, Int) =
      cs.collectFirst { case (`t`, s, e) => (s, e) }.getOrElse(bad(s"no $t"))
    try {
      val top = boxes(0, bytes.length)
      if (!top.headOption.exists(_._1 == "ftyp")) return None
      val (moovS, moovE) = one(top, "moov")
      val trak = boxes(moovS, moovE).collectFirst(Function.unlift {
        case ("trak", ts, te) =>
          // a sibling trak that is not a well-formed video track (no
          // mdia/hdlr, or a 'soun'/'text' handler) is SKIPPED, not a
          // parse failure — scan on for the first 'vide' one
          scala.util.Try {
            val cs = boxes(ts, te)
            val (ms, me) = one(cs, "mdia")
            val mcs = boxes(ms, me)
            val (hs, _) = one(mcs, "hdlr")
            // handler type sits after version/flags + pre_defined
            if (new String(bytes, hs + 8, 4, "US-ASCII") == "vide")
              Some((one(cs, "tkhd"), mcs)) else None
          }.toOption.flatten
        case _ => None
      }).getOrElse(bad("no video trak"))
      val ((tkS, _), mdiaBoxes) = trak
      // tkhd v1 widens creation/modification/duration to u64
      val tkOff = if (bytes(tkS) == 1) 88 else 76
      val w = (u32(tkS + tkOff) >> 16).toInt
      val h = (u32(tkS + tkOff + 4) >> 16).toInt
      val (mdS, _) = one(mdiaBoxes, "mdhd")
      val timescale = if (bytes(mdS) == 1) u32(mdS + 20) else u32(mdS + 12)
      if (timescale <= 0) bad("bad timescale")
      val (minfS, minfE) = one(mdiaBoxes, "minf")
      val (stblS, stblE) = one(boxes(minfS, minfE), "stbl")
      val stbl = boxes(stblS, stblE)
      val (sttsS, _) = one(stbl, "stts")
      if (u32(sttsS + 4) < 1) bad("empty stts")
      // the clock comes from the FIRST stts run: a constant-frame-rate
      // track (every muxer here, and most in the wild) has one run, so
      // the clock is exact; a track whose runs disagree (VFR, or CFR
      // with an odd final delta) demuxes fine — dims and frame payloads
      // stay exact — but gets the first run's uniform clock, so its
      // duration_s is approximate, not authoritative
      val usf = u32(sttsS + 12) * 1000000L / timescale
      // sizes: fixed sample_size, or the per-sample table
      val (stszS, _) = one(stbl, "stsz")
      val fixedSz = u32(stszS + 4)
      val nSamples = u32(stszS + 8).toInt
      if (nSamples < 0 || nSamples > bytes.length) bad("bad sample count")
      val sizes = if (fixedSz != 0) Array.fill(nSamples)(fixedSz)
        else Array.tabulate(nSamples)(i => u32(stszS + 12 + 4 * i))
      // chunk offsets: stco (u32) or co64 (u64)
      val chunkOffs = stbl.collectFirst {
        case ("stco", s, _) => Array.tabulate(u32(s + 4).toInt)(i => u32(s + 8 + 4 * i))
        case ("co64", s, _) => Array.tabulate(u32(s + 4).toInt)(i => u64(s + 8 + 8 * i))
      }.getOrElse(bad("no stco/co64"))
      // stsc runs → samples-per-chunk for each chunk index
      val (stscS, _) = one(stbl, "stsc")
      val runs = Array.tabulate(u32(stscS + 4).toInt)(i =>
        (u32(stscS + 8 + 12 * i).toInt, u32(stscS + 12 + 12 * i).toInt))
      val frames = Vector.newBuilder[Array[Byte]]
      var sample = 0
      var chunk = 0
      var run = 0
      while (sample < nSamples && chunk < chunkOffs.length) {
        while (run + 1 < runs.length && runs(run + 1)._1 <= chunk + 1) run += 1
        var off = chunkOffs(chunk)
        var i = 0
        while (i < runs(run)._2 && sample < nSamples) {
          val sz = sizes(sample)
          if (off < 0 || sz < 0 || off + sz > bytes.length) bad("sample out of range")
          frames += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
          off += sz; sample += 1; i += 1
        }
        chunk += 1
      }
      if (sample < nSamples) bad("sample table short of chunks")
      Some((w, h, usf, frames.result()))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Container sniff → the right demuxer: RIFF('AVI ') little-endian
    * chunks via [[demuxAvi]], ISO-BMFF ('ftyp' leading box) via
    * [[demuxMp4]]. The ONE entry [[decodeVideo]] and [[sampleFrames]]
    * share, so every video operator handles both containers. */
  private[operators] def demuxVideo(bytes: Array[Byte])
      : Option[(Int, Int, Long, Vector[Array[Byte]])] = {
    if (bytes == null || bytes.length < 16) None
    else if (new String(bytes, 0, 4, "US-ASCII") == "RIFF") demuxAvi(bytes)
    else if (new String(bytes, 4, 4, "US-ASCII") == "ftyp") demuxMp4(bytes)
    else None
  }

  /** Demuxed-video metadata: container header dims, frame count from
    * the actual movi chunks, duration from the header clock —
    * `n_frames · µsPerFrame / 1e6` (exact integer product, one
    * correctly-rounded division: SQL-replayable). */
  case class VideoMeta(width: Int, height: Int, n_frames: Int, duration_s: Double)

  /** REAL video decode (licensed UDF): [[demuxVideo]] the container
    * (RIFF/AVI or ISO-BMFF/MP4), report header dims + true frame count
    * + duration. Null for payloads that are neither. This replaces the
    * r13 `decodeStub` — no fake legs remain in any modality. */
  val decodeVideo: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { bytes: Array[Byte] =>
      demuxVideo(bytes).map { case (w, h, usf, frames) =>
        VideoMeta(w, h, frames.length, (frames.length.toLong * usf).toDouble / 1e6)
      }
    }

  /** Per-frame metadata from [[sampleFrames]] — [[ImageMeta]] plus the
    * sampled frame index. */
  case class FrameMeta(frame: Int, width: Int, height: Int, luma_sum: Long)

  /** REAL frame sampling + decode (licensed UDF): [[demuxVideo]] the
    * container (AVI or MP4), pick `k` evenly spaced frames with the
    * SAME index math as [[frameSampleIndices]] (`(i·n) / k` integer
    * truncation; all frames when n ≤ k), and decode each through
    * ImageIO — (frame, width, height, Σ BT.601 integer luma) per
    * sampled frame, exactly [[decodeImage]]'s grid. Null for
    * non-video bytes or undecodable frames. At 100 TB this is the
    * per-row "sample 8 frames before embedding" step: narrow scan work
    * whose cost is k decodes per asset regardless of clip length. */
  val sampleFrames: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], k: Int) =>
      if (k <= 0) None
      else demuxVideo(bytes).flatMap { case (_, _, _, frames) =>
        val n = frames.length
        if (n == 0) None
        else try {
          val idx = if (n <= k) 0 until n else (0 until k).map(i => i * n / k)
          Some(idx.map { f =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(frames(f)))
            if (img == null) throw new java.io.IOException(s"frame $f undecodable")
            FrameMeta(f, img.getWidth, img.getHeight, lumaOf(img))
          })
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }

  /** REAL nearest-neighbor image RESIZE (licensed UDF, same codec
    * license as [[decodeImage]]): decode via ImageIO, sample source
    * pixel `((x·srcW) / dstW, (y·srcH) / dstH)` (integer truncation —
    * the classic nearest-neighbor grid, exactly replayable in SQL),
    * re-encode PNG. Null for undecodable input or non-positive target
    * dims. Narrow per-row work like the decode; at 100 TB the resize
    * rides in the scan projection between decode and feature
    * extraction — the training-pipeline "thumbnail before embed"
    * step. */
  val resizeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], dstW: Int, dstH: Int) =>
      if (bytes == null || dstW <= 0 || dstH <= 0) None
      else try {
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (src == null) None
        else {
          val out = new java.awt.image.BufferedImage(
            dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val (sw, sh) = (src.getWidth, src.getHeight)
          var y = 0
          while (y < dstH) {
            var x = 0
            while (x < dstW) {
              // Long math: x·sw overflows Int for panorama-scale inputs
              // (40k×60k), and the NonFatal catch would turn the wrap
              // into a silent null for a perfectly decodable image
              out.setRGB(x, y, src.getRGB((x.toLong * sw / dstW).toInt,
                (y.toLong * sh / dstH).toInt) & 0xffffff)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Decoded-audio metadata — [[ImageMeta]]'s audio sibling, exact
    * integer amplitude sum (Σ |16-bit sample| over EVERY channel
    * sample, undivided) so the value replays in SQL. `n_samples`
    * counts FRAMES (per-channel sample count), so duration =
    * n_samples / sample_rate holds for any channel count. */
  case class AudioMeta(sample_rate: Int, channels: Int,
                       n_samples: Long, abs_sum: Long)

  /** REAL audio decode for WAV/PCM (licensed UDF): the JDK's own
    * `javax.sound.sampled.AudioSystem` parses the RIFF container and
    * format chunk — zero new dependencies, a genuine codec path like
    * [[decodeImage]]. Emits (sample_rate, channels, n_samples,
    * Σ |sample|) with the amplitude sum on the exact signed-16-bit
    * integer grid. Null for anything AudioSystem rejects (MP3/OGG/
    * corrupt bytes). */
  val decodeWav: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { bytes: Array[Byte] =>
      if (bytes == null) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16) None
          else {
            val bigEndian = f.isBigEndian
            val data = in.readAllBytes()
            val n = data.length / 2 // channel-samples
            var s = 0L
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1) & 0xff
              val v = (if (bigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort
              s += math.abs(v.toLong)
              i += 1
            }
            // FRAMES, not interleaved channel-samples — a stereo clip's
            // duration (n_samples / sample_rate) must not double
            Some(AudioMeta(f.getSampleRate.toInt, f.getChannels,
              n.toLong / math.max(1, f.getChannels), s))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** REAL audio RESAMPLE by integer decimation (licensed UDF — the
    * audio member of the per-modality transform triad:
    * [[resizeImage]]'s nearest-neighbor grid, [[sampleFrames]]'s frame
    * schedule, and here every `factor`-th PCM16 FRAME kept, all
    * channels, emitted as a real WAV at `rate / factor` Hz (integer
    * truncation). Plain decimation, no low-pass — the deterministic
    * integer-grid analog of nearest-neighbor resize (an AA filter
    * would be float DSP a SQL oracle cannot replay; callers wanting
    * band-limited audio pre-filter upstream). Kept frames are indices
    * 0, k, 2k, … — exactly replayable — so
    * [[decodeWav]] ∘ [[resampleWav]] ∘ [[synthWav]] is the sample
    * formula at stride k. Null for non-PCM16 input or factor < 1;
    * factor 1 is a container round-trip. Narrow per-row scan work like
    * every codec here. */
  val resampleWav: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], factor: Int) =>
      if (bytes == null || factor < 1) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16) None
          else {
            val frameSz = f.getFrameSize
            val data = in.readAllBytes()
            val nFrames = data.length / frameSz
            val nKept = (nFrames + factor - 1) / factor
            val out = new Array[Byte](nKept * frameSz)
            var i = 0
            while (i < nKept) {
              System.arraycopy(data, i * factor * frameSz, out, i * frameSz, frameSz)
              i += 1
            }
            val outRate = math.max(1, f.getSampleRate.toInt / factor)
            val outFmt = new javax.sound.sampled.AudioFormat(
              outRate.toFloat, 16, f.getChannels, true, f.isBigEndian)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(out), outFmt, nKept.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            Some(bos.toByteArray)
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Deterministic PCM16 mono WAV fixture generator ([[synthPng]]'s
    * audio sibling, fixture-only): sample i of clip `id` is
    * `((id·7919 + i·104729) mod 65536) − 32768` — pure integer
    * arithmetic a SQL oracle replays verbatim, emitted through a real
    * RIFF/WAVE container that [[decodeWav]] parses back with the JDK's
    * own reader. */
  val synthWav: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, n: Int, sampleRate: Int) =>
      val samples = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = (((id * 7919 + i.toLong * 104729) % 65536) - 32768).toShort
        samples(2 * i) = (v & 0xff).toByte
        samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

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

  /** Real-codec media fixture ([[syntheticMedia]]'s fully-decodable
    * sibling, fixture-only): modality by id mod 3, payload through the
    * REAL encoder for that modality — [[synthPng]] images (8+id%9 ×
    * 8+id%7), [[synthWav]] mono PCM16 audio (64+id%17 samples @ 8 kHz),
    * and video (3+id%4 frames, 8×6, 10 fps) ALTERNATING container by
    * id parity — [[synthAvi]] RIFF/AVI for even video ids, [[synthMp4]]
    * ISO-BMFF for odd — with identical frame content and clock, so one
    * oracle covers both containers. Every payload round-trips through
    * its real JDK codec/container and every decoded number replays
    * from the generator formulas in SQL. */
  def realMedia(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    docs.select(
      id.as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (id % 3 + 1).cast("int")).as("modality"),
      when(id % 3 === 0,
          synthPng(id, (lit(8) + id % 9).cast("int"), (lit(8) + id % 7).cast("int")))
        .when(id % 3 === 1, synthWav(id, (lit(64) + id % 17).cast("int"), lit(8000)))
        .when(id % 2 === 0, synthAvi(id, (lit(3) + id % 4).cast("int"), lit(8), lit(6)))
        .otherwise(synthMp4(id, (lit(3) + id % 4).cast("int"), lit(8), lit(6)))
        .as("bytes"),
      map(lit("codec"),
        when(id % 3 === 0, lit("png")).when(id % 3 === 1, lit("wav"))
          .when(id % 2 === 0, lit("avi-mpng")).otherwise(lit("mp4-mpng")),
        lit("source"), lit("synthetic")).as("meta"))
  }

  /** Full per-modality pipeline — every modality decodes through its
    * REAL codec/container (ImageIO images, AudioSystem WAV, the
    * [[demuxVideo]] RIFF/AVI + ISO-BMFF/MP4 path; the r13 crc32
    * `decodeStub` is gone):
    * decode + features + frame sampling in ONE narrow select over the
    * media table (no join, no shuffle), embarrassingly parallel at any
    * corpus size. `decoded` is the unified (width, height, duration_s)
    * view — dims null for audio, duration 0 for stills, everything
    * null for payloads the modality's decoder rejects; `frame_idx` is
    * the [[frameSampleIndices]] schedule over the demuxed TRUE frame
    * count. */
  def enrich(media: DataFrame, bins: Int = 64, frames: Int = 8): DataFrame =
    media
      .withColumn("features", featuresCol(bins))
      .withColumn("image",
        when(col("modality") === "image", decodeImage(col("bytes"))))
      .withColumn("audio",
        when(col("modality") === "audio", decodeWav(col("bytes"))))
      .withColumn("video",
        when(col("modality") === "video", decodeVideo(col("bytes"))))
      .withColumn("decoded",
        when(col("modality") === "image", struct(
          col("image.width").as("width"), col("image.height").as("height"),
          when(col("image").isNotNull, lit(0.0)).as("duration_s")))
          .when(col("modality") === "audio", struct(
            lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
            (col("audio.n_samples").cast("double") / col("audio.sample_rate"))
              .as("duration_s")))
          .when(col("modality") === "video", struct(
            col("video.width").as("width"), col("video.height").as("height"),
            col("video.duration_s").as("duration_s"))))
      .withColumn("frame_idx",
        when(col("modality") === "video" && col("video").isNotNull,
          frameSampleIndices(col("video.n_frames"), frames))
          .otherwise(array()))
}
