package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.Multimodal
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._

/** Real-image decode path ([[Multimodal.extractFeatures]] via javax.imageio)
  * plus the golden-hash oracle for the frame-sampling shape (mm1). Test
  * images are generated programmatically — lossless formats (PNG/BMP) make
  * the decoded pixels, and therefore the features, bit-reproducible, so the
  * goldens below are pinned constants, not fixtures.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic w×h test image: pixel (x,y) = RGB from a fixed formula. */
  private def testImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 37 + y * 11) % 256
      val g = (x * 5 + y * 73) % 256
      val b = (x * 97 + y * 3) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK must ship a $format writer")
    out.toByteArray
  }

  test("extractFeatures really decodes PNG and BMP payloads (pixels, not bytes)") {
    val png = encode(testImage(8, 6), "png")
    val bmp = encode(testImage(8, 6), "bmp")
    val assets = Seq(("png8x6", png), ("bmp8x6", bmp)).toDF("id", "bytes")
    val feats = Multimodal.extractFeatures(
      Multimodal.toAssets(assets, "id", "bytes", "image"), dim = 4)
      .collect().map(r => r.getAs[String]("asset_id") -> r).toMap
    // both decode, with true pixel dimensions
    for ((id, r) <- feats) {
      assert(r.getAs[Boolean]("decoded"), id)
      assert(r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 6, id)
    }
    // PNG and BMP encodings of the SAME pixels give IDENTICAL features —
    // impossible under the byte-fold stub (their encoded bytes differ), so
    // this pins that features come from decoded pixels
    assert(png.toSeq != bmp.toSeq)
    val fPng = { val r = feats("png8x6"); r.getSeq[Float](r.fieldIndex("features")).toList }
    val fBmp = { val r = feats("bmp8x6"); r.getSeq[Float](r.fieldIndex("features")).toList }
    assert(fPng == fBmp)
    // and they match an independent computation from the raw pixel formula
    val dim = 4
    val acc = new Array[Double](dim)
    for (y <- 0 until 6; x <- 0 until 8) {
      val (r, g, b) = ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x * 97 + y * 3) % 256)
      acc((y * 8 + x) % dim) += (r * 0.299 + g * 0.587 + b * 0.114) / 255.0
    }
    val accF = acc.map(_.toFloat)
    val n = math.sqrt(accF.map(v => v.toDouble * v).sum)
    val want = accF.map(v => (v / n).toFloat)
    fPng.zip(want).foreach { case (got, w) => assert(math.abs(got - w) < 1e-6f) }
  }

  test("extractFeatures golden hash over the committed pixel formula") {
    // md5 over the 6-dp-rounded features of a 16×16 PNG — a change to the
    // decode or the luminance fold shows up here as a one-line diff
    val png = encode(testImage(16, 16), "png")
    val assets = Seq(("g16", png)).toDF("id", "bytes")
    val row = Multimodal.extractFeatures(
      Multimodal.toAssets(assets, "id", "bytes", "image"), dim = 8)
      .collect().head
    val rendered = row.getSeq[Float](row.fieldIndex("features")).toList.map(f => f"$f%.6f").mkString(",")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rendered.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 == "0d7d450a5095898fae75ce3f63d252c9", s"rendered=$rendered md5=$md5")
  }

  test("undecodable bytes and non-image modalities fall back to the byte-fold stub") {
    val junk = Seq(("txt1", "definitely not an image")).toDF("id", "text")
    val viaImage = Multimodal.extractFeatures(
      Multimodal.toAssets(junk, "id", "text", "image"), dim = 4).collect().head
    assert(!viaImage.getAs[Boolean]("decoded"))
    assert(viaImage.getAs[Int]("width") == -1 && viaImage.getAs[Int]("height") == -1)
    // audio modality never attempts image decode; same payload → same features
    val viaAudio = Multimodal.extractFeatures(
      Multimodal.toAssets(junk, "id", "text", "audio"), dim = 4).collect().head
    assert(!viaAudio.getAs[Boolean]("decoded"))
    assert(viaImage.getSeq[Float](viaImage.fieldIndex("features")).toList == viaAudio.getSeq[Float](viaAudio.fieldIndex("features")).toList)
  }

  /** Deterministic 16-bit PCM WAV container around interleaved samples. */
  private def wavBytes(rate: Float, channels: Int, interleaved: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val bytes = new Array[Byte](interleaved.length * 2)
    interleaved.indices.foreach { i =>
      bytes(2 * i) = (interleaved(i) & 0xff).toByte
      bytes(2 * i + 1) = ((interleaved(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate, 16, channels, channels * 2, rate, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, interleaved.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("extractFeatures really decodes WAV payloads (PCM frames, not bytes)") {
    // stereo sine-ish signal; expected features computed from the SAMPLES
    // independently of the operator — byte-folding the WAV (header included)
    // could not reproduce them
    val nFrames = 400
    val interleaved = Array.tabulate[Short](nFrames * 2) { i =>
      val f = i / 2
      val base = math.sin(f * 0.1) * 12000
      (if (i % 2 == 0) base else base * 0.5).toShort
    }
    val wav = wavBytes(8000f, 2, interleaved)
    val assets = Seq(("a1", wav)).toDF("id", "bytes")
    val row = Multimodal.extractFeatures(
      Multimodal.toAssets(assets, "id", "bytes", "audio"), dim = 6)
      .collect().head
    assert(row.getAs[Boolean]("decoded"), "WAV payload must really decode")
    assert(row.getAs[Int]("width") == 8000, "width slot carries the sample rate")
    assert(row.getAs[Int]("height") == 2, "height slot carries the channel count")
    val acc = new Array[Double](6)
    (0 until nFrames).foreach { f =>
      val mono = (interleaved(2 * f) / 32768.0 + interleaved(2 * f + 1) / 32768.0) / 2.0
      acc(f % 6) += math.abs(mono.toFloat.toDouble)
    }
    val n = math.sqrt(acc.map(v => v * v).sum)
    val want = acc.map(v => (v / n).toFloat)
    row.getSeq[Float](row.fieldIndex("features")).zip(want).foreach {
      case (got, w) => assert(math.abs(got - w) < 1e-6f, s"got=$got want=$w")
    }
  }

  test("extractFeatures golden hash over the committed PCM formula") {
    // md5 over the 6-dp-rounded features of a deterministic mono WAV — a
    // change to the decode or the amplitude fold shows up as a one-line diff
    val samples = Array.tabulate[Short](512)(i => ((i * 131 + 17) % 24001 - 12000).toShort)
    val wav = wavBytes(16000f, 1, samples)
    val assets = Seq(("gwav", wav)).toDF("id", "bytes")
    val row = Multimodal.extractFeatures(
      Multimodal.toAssets(assets, "id", "bytes", "audio"), dim = 8)
      .collect().head
    assert(row.getAs[Boolean]("decoded") && row.getAs[Int]("width") == 16000)
    val rendered = row.getSeq[Float](row.fieldIndex("features")).toList.map(f => f"$f%.6f").mkString(",")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rendered.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 == "bb9bee2710d075e9b17aca7c478609e3", s"rendered=$rendered md5=$md5")
  }

  test("audioFingerprint: a gain-shifted and a re-quantized WAV copy pair with the original") {
    import graft.operators.Multimodal
    // amplitude-modulated tone: frame energies vary smoothly, so the 63
    // delta bits carry real structure (an unmodulated tone would be all-flat)
    def tone(phase: Double, gain: Double): Array[Short] =
      Array.tabulate[Short](2048) { i =>
        val env = 6000.0 + 4000.0 * math.sin(i * 0.012 + phase)
        (math.sin(i * 0.31) * env * gain).toShort
      }
    val orig = wavBytes(8000f, 1, tone(0.0, 1.0))
    val gained = wavBytes(8000f, 1, tone(0.0, 0.5)) // volume-shifted copy
    val requant = wavBytes(8000f, 1, tone(0.0, 0.23)) // heavy re-quantization
    val other = wavBytes(8000f, 1, tone(2.1, 1.0)) // different signal
    val assets = Seq(("orig", orig), ("gain", gained), ("req", requant),
      ("other", other)).toDF("id", "bytes")
    val fps = Multimodal.audioFingerprint(
        Multimodal.toAssets(assets, "id", "bytes", "audio"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(fps.values.forall(_._1), "all four WAVs must really decode")
    val fp = fps.view.mapValues(_._2).toMap
    assert(fp("orig") != 0L, "fingerprint must carry structure")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // gain invariance is exact in the energy algebra; the only drift is the
    // 16-bit re-quantization of the scaled samples — a few bits at most
    assert(ham(fp("orig"), fp("gain")) <= 3,
      s"gain-shifted copy at Hamming ${ham(fp("orig"), fp("gain"))}")
    assert(ham(fp("orig"), fp("req")) <= 3,
      s"re-quantized copy at Hamming ${ham(fp("orig"), fp("req"))}")
    assert(ham(fp("orig"), fp("other")) >= 10,
      s"different signal too close: Hamming ${ham(fp("orig"), fp("other"))}")
  }

  test("audioFingerprint fallback: byte-grid energies, hand-computed, decoded=false") {
    import graft.operators.Multimodal
    val text = "abcxyz" * 40 // 240 ASCII bytes
    val df = Seq(("t1", text)).toDF("id", "text")
    val row = Multimodal.audioFingerprint(
        Multimodal.toAssets(df, "id", "text", "audio"))
      .collect().head
    assert(!row.getBoolean(1))
    val bytes = text.getBytes("UTF-8")
    val e = new Array[Long](64)
    bytes.indices.foreach { i =>
      val v = (bytes(i) & 0xff).toLong
      e((i.toLong * 64 / bytes.length).toInt) += v * v
    }
    var want = 0L
    (0 until 63).foreach { k => if (e(k + 1) > e(k)) want |= (1L << k) }
    assert(row.getLong(2) == want)
  }

  test("mm1 frame sampling golden hash (deterministic payload set)") {
    // the mm1 driver row is rows-only; this pins its exact output shape on a
    // committed deterministic payload set instead
    val docs = (0 until 20)
      .map(i => (s"v$i", ("frame-" + i.toString * 40) * (i + 1))).toDF("id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.toAssets(docs, "id", "text", "video"), frameBytes = 64, stride = 2)
      .select(col("asset_id"), col("frame_index"), col("byte_offset"),
        length(col("frame_payload")).as("frame_len"))
      .collect()
      .map(r => s"${r.getString(0)}|${r.getInt(1)}|${r.getLong(2)}|${r.getInt(3)}")
      .sorted.mkString("\n")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(frames.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 == "b4dd7e9feb27e6d88e23b55a6705c4c8", s"rows=${frames.linesIterator.size} md5=$md5")
  }

  // ----------------------------------------------------- MJPEG-in-AVI decode

  /** Little-endian u32. */
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** One RIFF chunk: fourcc + LE size + data + WORD pad. */
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  private def riffList(listType: String, content: Array[Byte]): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ content)

  /** A minimal structurally-valid AVI whose movi list holds the given
    * frame payloads as 00dc chunks (MJPEG = each frame a standalone JPEG). */
  private def makeAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val hdrl = riffList("hdrl", riffChunk("avih", new Array[Byte](56)))
    val movi = riffList("movi",
      frames.map(riffChunk("00dc", _)).foldLeft(Array.empty[Byte])(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  private def jpegOf(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  test("videoFrames: real MJPEG-in-AVI decode; fallback keeps the byte-window shape") {
    val jpegs = (0 until 6).map(i => jpegOf(testImage(16 + i, 12)))
    val avi = makeAvi(jpegs)
    // a "video" whose frames use some other codec: 00dc payloads not JPEG
    val foreign = makeAvi(Seq.empty) // valid container, no JPEG frames
    val rows = Seq(
      ("avi", avi),
      ("txt", ("not a video at all " * 20).getBytes("UTF-8")),
      ("bad", avi.take(40).toArray), // truncated: size chain past EOF
      ("oth", foreign)).toDF("id", "payload")
    val assets = rows.select(col("id").as("asset_id"),
      lit("video").as("modality"), col("payload"))
    val got = Multimodal.videoFrames(assets, frameBytes = 64, stride = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getBoolean(4), r.getInt(5), r.getInt(6)))
      .groupBy(_._1)

    // the AVI decodes for real: every 2nd of 6 frames, true dimensions
    val decoded = got("avi").sortBy(_._2)
    assert(decoded.length == 3 && decoded.forall(_._5),
      s"expected 3 decoded frames, got ${decoded.toSeq}")
    assert(decoded.map(_._2).toSeq == Seq(0, 1, 2))
    // frame i of the sample = source frame 2i, whose width is 16 + 2i
    assert(decoded.map(f => (f._6, f._7)).toSeq ==
      Seq((16, 12), (18, 12), (20, 12)))
    // byte offsets strictly increase and frame_len matches the JPEG sizes
    assert(decoded.map(_._3).toSeq == decoded.map(_._3).sorted.toSeq)
    assert(decoded.map(_._4).toSeq == Seq(jpegs(0).length, jpegs(2).length, jpegs(4).length))
    // the JPEG bytes at the reported offsets really are the frames
    decoded.zip(Seq(0, 2, 4)).foreach { case ((_, _, ofs, len, _, _, _), src) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, ofs.toInt, ofs.toInt + len),
        jpegs(src)), s"offset $ofs does not hold source frame $src")
    }

    // non-AVI, truncated-AVI and frameless-AVI all take the flagged fallback
    for (k <- Seq("txt", "bad", "oth")) {
      val fb = got(k)
      assert(fb.forall(f => !f._5 && f._6 == -1 && f._7 == -1),
        s"$k must take the decoded=false fallback: ${fb.toSeq}")
    }
    // and the fallback's window arithmetic matches sampleFrames exactly
    val n = ("not a video at all " * 20).getBytes("UTF-8").length
    val fbTxt = got("txt").sortBy(_._2)
    assert(fbTxt.length == math.max(n / 128, 1))
    assert(fbTxt.forall(f => f._3 == f._2.toLong * 128 &&
      f._4 == math.min(64, n - f._3).max(0)))
  }

  test("imageAHash: real pixels (PNG == BMP), byte fallback, bright-half bits") {
    // left half black, right half white: cells 0-3 of each grid row dark,
    // cells 4-7 bright -> exactly the bright-half bits set in every row
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xffffff)
    val png = encode(img, "png")
    val bmp = encode(img, "bmp")
    val assets = Seq(("png", png), ("bmp", bmp), ("junk", Array[Byte](1, 2, 3, 4)))
      .toDF("id", "bytes")
    val got = Multimodal.imageAHash(Multimodal.toAssets(assets, "id", "bytes", "image"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(got("png")._1 && got("bmp")._1 && !got("junk")._1)
    // PNG and BMP encode DIFFERENT bytes of the SAME pixels: equal hashes
    // pin that the hash comes from decoded content, not payload bytes
    assert(png.toSeq != bmp.toSeq)
    assert(got("png")._2 == got("bmp")._2)
    // expected: bit (row*8 + col) set iff col >= 4, for all 8 rows
    val want = (for (row <- 0 until 8; c <- 4 until 8) yield 1L << (row * 8 + c)).sum
    assert(got("png")._2 == want, f"got ${got("png")._2}%016x want $want%016x")
    // the undecodable payload still hashes deterministically via bytes
    assert(got("junk")._2 != 0L)
  }

  test("image decode rejects outsized headers before any pixel allocation") {
    // take a real tiny PNG and patch its IHDR to CLAIM 100000x100000 (with a
    // fixed-up CRC): the bounded decoder must reject on the header dims and
    // fall back to the byte path, decoded=false — never allocate 40 GB
    val png = encode(testImage(4, 4), "png")
    val big = png.clone()
    val dim = java.nio.ByteBuffer.allocate(4).putInt(100000).array()
    for (i <- 0 until 4) { big(16 + i) = dim(i); big(20 + i) = dim(i) }
    val crc = new java.util.zip.CRC32()
    crc.update(big, 12, 17) // chunk type (4) + IHDR data (13)
    java.nio.ByteBuffer.wrap(big, 29, 4).putInt(crc.getValue.toInt)
    val assets = Seq(("big", big), ("ok", png)).toDF("id", "bytes")
    val got = Multimodal.imageAHash(Multimodal.toAssets(assets, "id", "bytes", "image"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!got("big")) // header-gated: rejected without decoding
    assert(got("ok"))   // the unpatched twin still really decodes
  }
}
