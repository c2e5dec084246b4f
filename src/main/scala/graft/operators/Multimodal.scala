package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side contract is real and tested — schema, partition-level batch
  * shape, deterministic output layout. IMAGE payloads get REAL pixel decoding
  * via `javax.imageio` (PNG/BMP/JPEG/GIF — ships with the JDK, zero new
  * dependencies): features are an L2-normalized luminance fold over the
  * actual pixels, with width/height surfaced. AUDIO payloads get REAL PCM
  * decoding via `javax.sound.sampled` (WAV/AIFF/AU — also JDK-only):
  * features are an amplitude fold over the decoded mono samples, with
  * (sampleRate, channels) surfaced. Bytes neither codec can parse — and the
  * VIDEO modality, the one with no JDK codec — fall back to the
  * deterministic byte-fold stub (`fakeDecode`), flagged `decoded=false`; a
  * production deployment swaps that fallback for a real codec (JNI/ffmpeg/
  * PIL-on-mapInPandas) without touching any of the plumbing.
  */
object Multimodal {

  /** Per-asset cap on decoded PCM bytes (defensive bound against malformed
    * headers that declare enormous frame counts; 64 MiB ≈ 6 min of 16-bit
    * stereo at 44.1 kHz, far past any feature-extraction need). */
  private val MaxDecodedAudioBytes: Int = 64 << 20

  /** Canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap a text/“pretend payload” DataFrame into the asset schema (test fixture
    * path; real ingest reads `spark.read.format("binaryFile")`). */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("string").as("asset_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      lit(s"application/x-fake-$modality").as("mime"),
      map(lit("origin"), lit("synthetic")).as("meta"))

  /** Real image decode (PNG/BMP/JPEG/GIF/TIFF via the JDK's javax.imageio):
    * payload bytes → BufferedImage, None when the bytes aren't a supported
    * image. ImageIO instances are not thread-safe to share, but each call
    * creates its own reader — safe under Spark's task parallelism. */
  /** Decoded-image pixel cap (≈64 MiB as TYPE_INT_RGB): a container whose
    * HEADER claims outsized dimensions must be rejected BEFORE pixel decode
    * — ImageIO.read allocates width×height×4 bytes up front, so at corpus
    * scale one adversarial 100-megapixel header is an executor OOM, not a
    * slow task. Same contract as [[MaxDecodedAudioBytes]]. */
  private[operators] val MaxDecodedPixels: Long = 16L * 1024 * 1024

  /** Container magics of the image formats this operator decodes — PNG,
    * JPEG, GIF, BMP, TIFF (both byte orders). WBMP is deliberately ABSENT:
    * ImageIO's WBMP sniff is two near-NUL bytes plus plausible dimensions —
    * lax enough that non-image bytes can pass — which would make the decode
    * arm data-dependent in a way no SQL twin can replay. The gate runs
    * BEFORE ImageIO sniffing, making "attempted real decode" a closed
    * byte-prefix predicate (the [[AudioMagics]] convention; r18 advice —
    * only BM/GIF8/II*&#92;0/MM&#92;0* can appear in 1-byte-per-char text, so
    * the ASCII-pinned board rows exclude those prefixes on both sides). */
  private[operators] val ImageMagicBytes: Seq[Array[Byte]] = Seq(
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
    Array(0xff.toByte, 0xd8.toByte, 0xff.toByte),
    "GIF8".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
    "BM".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
    Array('I'.toByte, 'I'.toByte, '*'.toByte, 0.toByte),
    Array('M'.toByte, 'M'.toByte, 0.toByte, '*'.toByte))

  private def hasImageMagic(payload: Array[Byte]): Boolean =
    payload != null && ImageMagicBytes.exists(m =>
      payload.length >= m.length && m.indices.forall(i => payload(i) == m(i)))

  private[operators] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!hasImageMagic(payload)) None
    else try {
      // ImageIO's default disk cache would create a temp file PER PAYLOAD
      // (including every non-image probe) — wrap the already-in-memory bytes
      // in a memory-cache stream instead; no executor-side disk I/O.
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) { stream.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(stream)
          // dimensions come from the HEADER — no pixel allocation yet; gate
          // the real decode on them
          val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
          if (w <= 0 || h <= 0 || w * h > MaxDecodedPixels) None
          else Option(reader.read(0))
        } finally {
          reader.dispose()
          stream.close()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic features from REAL pixels: per-pixel Rec.601 luminance in
    * [0,1], folded row-major into `dim` buckets, L2-normalized — the same
    * output contract as the byte-fold fallback, derived from decoded image
    * content. Lossless formats (PNG/BMP) make this bit-reproducible. */
  private[operators] def pixelFeatures(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 0.299 +
          ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114) / 255.0
        out((y * w + x) % dim) += luma.toFloat
        x += 1
      }
      y += 1
    }
    val n = math.sqrt(out.map(v => v.toDouble * v).sum)
    if (n > 0) (0 until dim).foreach(j => out(j) = (out(j) / n).toFloat)
    out
  }

  /** Container magics of the JDK-decodable audio formats — WAV ("RIFF"),
    * AU (".snd"), AIFF ("FORM"). All three are PRINTABLE ASCII, so a plain
    * text payload could in principle open with one and parse as audio; the
    * magic gate below makes "attempted real decode" a 4-byte-prefix
    * predicate any SQL engine can replay (r17 advice — the mm4 oracle
    * filters these prefixes out, so its decoded=false twin is exact by
    * construction instead of by luck). */
  private[operators] val AudioMagics = Seq("RIFF", ".snd", "FORM")

  private def hasMagic(payload: Array[Byte], magics: Seq[String]): Boolean =
    payload != null && payload.length >= 4 && {
      val head = new String(payload, 0, 4, java.nio.charset.StandardCharsets.US_ASCII)
      magics.contains(head)
    }

  /** Real audio decode (WAV/AIFF/AU via the JDK's javax.sound.sampled — zero
    * new dependencies): payload bytes → mono float samples in [-1, 1] plus
    * (sampleRate, channels). Non-PCM encodings are converted to signed 16-bit
    * PCM first; bytes that aren't a supported audio container return None.
    * Gated on the 4-byte container magic BEFORE touching AudioSystem: the
    * decode arm is then an oracle-expressible predicate (see [[AudioMagics]])
    * and garbage payloads skip the exception machinery entirely.
    * Each call builds its own streams — safe under task parallelism. */
  private[operators] def decodeAudio(payload: Array[Byte]): Option[(Array[Float], Float, Int)] =
    if (!hasMagic(payload, AudioMagics)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val ch = fmt.getChannels
        // canonical little-endian signed 16-bit PCM at the source rate
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, ch, ch * 2, fmt.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        // closed explicitly: over a ByteArrayInputStream this is a formality,
        // but a conversion chain may hold native/codec resources. The read is
        // capped: decoded PCM is ~(bit-depth ratio)× the payload for real
        // containers, so 64 MiB per asset bounds driver-side surprise from a
        // malformed header claiming an enormous frame count.
        val bytes =
          try pcm.readNBytes(MaxDecodedAudioBytes)
          finally pcm.close()
        val nFrames = bytes.length / (2 * ch)
        val mono = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var c = 0
          var acc = 0.0
          while (c < ch) {
            val i = (f * ch + c) * 2
            acc += ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort / 32768.0
            c += 1
          }
          mono(f) = (acc / ch).toFloat
          f += 1
        }
        Some((mono, fmt.getSampleRate, ch))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic features from REAL PCM frames: absolute sample amplitude
    * folded into `dim` buckets, L2-normalized — the audio twin of
    * [[pixelFeatures]], same output contract. */
  private[operators] def audioFeatures(samples: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < samples.length) {
      out(i % dim) += math.abs(samples(i))
      i += 1
    }
    val n = math.sqrt(out.map(v => v.toDouble * v).sum)
    if (n > 0) (0 until dim).foreach(j => out(j) = (out(j) / n).toFloat)
    out
  }

  // =================== FALLBACK: deterministic byte-fold stub ===================
  // Used for undecodable bytes and the video modality (the one with no JDK
  // codec); a production build replaces this with a real media decoder. The
  // fold derives "features" purely from the bytes so tests are deterministic.
  private def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.sqrt(out.map(x => x.toDouble * x).sum)
    if (n > 0) (0 until dim).foreach(j => out(j) = (out(j) / n).toFloat)
    out
  }

  /** Feature extraction over assets: per-partition batched decode → fixed-dim
    * feature vector + byte stats. Image payloads are REALLY decoded
    * ([[decodeImage]]) with pixel-luminance features and width/height; audio
    * payloads are REALLY decoded ([[decodeAudio]]) with amplitude features
    * and (sampleRate, channels) in the width/height slots; anything the JDK
    * codecs can't parse (and the video modality) takes the byte-fold
    * fallback with −1 metadata and `decoded=false`. Partition-level batching
    * mirrors how a real GPU/codec decoder would amortize setup cost; output
    * schema is stable across modalities. */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "modality", "payload").mapPartitions { it =>
      // batch shape: the iterator is consumed in groups so a real decoder could
      // submit one batch per device call
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val nBytes = if (payload == null) 0L else payload.length.toLong
          // real decode per modality; for audio the (width, height) slots
          // carry (sampleRate Hz, channels) — the stable schema's metadata
          // pair, documented here rather than widened per modality
          val decoded: Option[Row] = r.getString(1) match {
            case "image" => decodeImage(payload).map(i =>
              Row(r.getString(0), r.getString(1), nBytes,
                pixelFeatures(i, dim).toSeq, true, i.getWidth, i.getHeight))
            case "audio" => decodeAudio(payload).map { case (samples, rate, ch) =>
              Row(r.getString(0), r.getString(1), nBytes,
                audioFeatures(samples, dim).toSeq, true, rate.toInt, ch) }
            case _ => None
          }
          decoded.getOrElse(
            Row(r.getString(0), r.getString(1), nBytes,
              fakeDecode(payload, dim).toSeq, false, -1, -1))
        }
      }
    }(enc)
  }

  /** Perceptual average-hash (aHash) — the classic image near-dup
    * fingerprint: the DECODED image is block-averaged onto an 8×8 luminance
    * grid, and bit k is set when cell k's mean beats the image's GLOBAL
    * mean — a 64-bit signature whose Hamming distance tracks visual
    * similarity (resize/recompression-invariant by construction: the block
    * average absorbs them). Downstream, pair hashes exactly like e8's
    * binary signatures (XOR + popcount, Hamming-bucket blocking) for
    * corpus-scale image dedup.
    *
    * The global-mean criterion (classic aHash uses the mean of cell means)
    * is chosen for exactness: every comparison is the integer cross-product
    * cellSum·N > total·cellCount — no accumulated-float tie can flip a bit,
    * on any engine, for integer-valued inputs (bytes; pixel lumas are
    * deterministic doubles within the JVM).
    *
    * Undecodable payloads and non-image modalities take the byte-grid
    * fallback (raw byte values block-averaged onto the same 64 cells,
    * `decoded = false`) — the mm1/mm2 convention: the Spark-side shape
    * (schema, batching, partitioning) is exercised end-to-end with no codec,
    * and the byte path is reproducible by any engine that can read bytes.
    *
    * Output: (asset_id, decoded BOOLEAN, ahash BIGINT — all 64 bits used;
    * split with shiftrightunsigned for engines without unsigned longs). */
  def imageAHash(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "modality", "payload").mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val cells = new Array[Double](64)
          val counts = new Array[Long](64)
          var isDecoded = false
          if (r.getString(1) == "image") decodeImage(payload).foreach { img =>
            isDecoded = true
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val luma = ((rgb >> 16) & 0xff) * 0.299 +
                  ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114
                val cell = (y * 8 / h) * 8 + (x * 8 / w)
                cells(cell) += luma
                counts(cell) += 1
                x += 1
              }
              y += 1
            }
          }
          if (!isDecoded && payload != null) {
            val n = payload.length
            var i = 0
            while (i < n) {
              val cell = (i.toLong * 64 / n).toInt
              cells(cell) += (payload(i) & 0xff)
              counts(cell) += 1
              i += 1
            }
          }
          val total = cells.sum
          val nAll = counts.sum
          var hash = 0L
          var k = 0
          while (k < 64) {
            // cell mean > global mean, as an exact cross-product (no division)
            if (counts(k) > 0 && cells(k) * nAll > total * counts(k))
              hash |= (1L << k)
            k += 1
          }
          Row(r.getString(0), isDecoded, hash)
        }
      }
    }(enc)
  }

  /** Perceptual audio fingerprint (mm4) — the audio twin of [[imageAHash]],
    * closing the multimodal near-dup gap (images had aHash; audio only had
    * amplitude features, no signature). Chromaprint-shaped sign-of-delta
    * energy: the DECODED mono PCM stream is split into 64 equal frames,
    * each frame's energy is the sum of squared samples, and bit k
    * (k = 0..62) is set when frame k+1's energy exceeds frame k's — a
    * 63-bit signature whose Hamming distance tracks perceptual similarity.
    * GAIN-INVARIANT by construction: scaling every sample by g > 0 scales
    * every energy by g², so all 63 comparisons are unchanged — a re-encoded
    * or volume-shifted copy lands within a few bits of its original
    * (MultimodalSpec pins a gain-shifted and a re-quantized copy). Bit 63
    * is unused (0), so the value is non-negative and splits into unsigned
    * halves like mm3's.
    *
    * Frame energies accumulate sequentially per asset (deterministic within
    * the JVM); the real-decode path is fixture-pinned, not oracle-replayed
    * — the oracle replays the FALLBACK arm (the mm1/mm2/mm3 convention):
    * undecodable payloads and non-audio modalities take byte-grid energies
    * (sum of squared unsigned byte values per 64-cell grid, integer-exact,
    * `decoded = false`), reproducible by any engine that can read bytes.
    *
    * Downstream pairing reuses the e8/mm3 Hamming machinery (XOR +
    * popcount; band-block on 16-bit signature slices for corpus scale).
    * Output: (asset_id, decoded BOOLEAN, fp BIGINT — bits 0..62). */
  def audioFingerprint(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("fp", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "modality", "payload").mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val energies = new Array[Double](64)
          var isDecoded = false
          if (r.getString(1) == "audio") decodeAudio(payload).foreach {
            case (samples, _, _) =>
              isDecoded = true
              val n = samples.length
              var i = 0
              while (i < n) {
                val frame = (i.toLong * 64 / n).toInt
                energies(frame) += samples(i).toDouble * samples(i)
                i += 1
              }
          }
          if (!isDecoded && payload != null) {
            val n = payload.length
            var i = 0
            while (i < n) {
              val cell = (i.toLong * 64 / n).toInt
              val v = (payload(i) & 0xff).toDouble
              energies(cell) += v * v // integer-valued: exact in a double
              i += 1
            }
          }
          var fp = 0L
          var k = 0
          while (k < 63) {
            if (energies(k + 1) > energies(k)) fp |= (1L << k)
            k += 1
          }
          Row(r.getString(0), isDecoded, fp)
        }
      }
    }(enc)
  }

  // ====================== REAL video decode: MJPEG-in-AVI ======================

  /** Chunk-scan cap: a RIFF file is a flat/nested chunk list, and each chunk
    * header is read before its size is trusted — bound the walk so a
    * malformed size chain can't spin a task (64k chunks ≈ 36 min of 30fps
    * video, far past any fixture need; longer files decode their prefix). */
  private val MaxRiffChunks = 65536

  /** Parse an AVI (RIFF) container and return the MJPEG frame locations:
    * (byteOffset, length) of each video frame chunk whose payload is a JPEG
    * (SOI marker 0xFFD8) — MJPEG is exactly "every frame is a standalone
    * JPEG", which `javax.imageio` already decodes, so a from-scratch
    * container walk + the JDK codec gives REAL video frame decode with zero
    * new dependencies (the [[graft.sources.DocConverter]] precedent).
    *
    * RIFF structure walked: `RIFF <size> AVI ` at the top, then a chunk
    * sequence where `LIST <size> <type>` nests (the `movi` list holds the
    * frames) and every other chunk is `<fourcc> <size> <data>` with WORD
    * padding. Frame chunks are `##dc`/`##db` (compressed/uncompressed video
    * for stream ##). Anything structurally off — short header, size past
    * EOF, non-JPEG frame payloads — returns None and the caller falls back
    * to the byte-window stub, flagged `decoded=false` (other codecs keep
    * the documented fallback). */
  private[operators] def aviMjpegFrames(payload: Array[Byte]): Option[Seq[(Long, Int)]] = {
    if (payload == null || payload.length < 12) return None
    def fourcc(o: Int): String =
      new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val end = math.min(payload.length.toLong, 8L + u32(4))
    val frames = Seq.newBuilder[(Long, Int)]
    var sawMovi = false
    var chunks = 0
    // depth-bounded: real AVIs nest 2-3 LISTs; a crafted chain of thousands
    // of nested 12-byte LIST headers would otherwise overflow the task
    // stack (StackOverflowError is fatal, not the documented fallback)
    def walk(from: Long, to: Long, inMovi: Boolean, depth: Int): Boolean = {
      if (depth > 16) return false // malformed by construction
      var o = from
      while (o + 8 <= to) {
        chunks += 1
        if (chunks > MaxRiffChunks) return true // prefix decode, not failure
        val id = fourcc(o.toInt)
        val sz = u32(o.toInt + 4)
        val dataOfs = o + 8
        if (dataOfs + sz > to) return false // size chain runs past the container
        if (id == "LIST" || id == "RIFF") {
          if (sz < 4) return false
          val listType = fourcc(dataOfs.toInt)
          if (listType == "movi") sawMovi = true
          if (!walk(dataOfs + 4, dataOfs + sz, inMovi || listType == "movi",
              depth + 1))
            return false
        } else if (inMovi && sz >= 2 &&
            id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db"))) {
          // a video frame chunk; MJPEG ⇔ the payload is a standalone JPEG
          if ((payload(dataOfs.toInt) & 0xff) == 0xff &&
              (payload(dataOfs.toInt + 1) & 0xff) == 0xd8)
            frames += ((dataOfs, sz.toInt))
          else return false // a non-JPEG codec: whole file takes the fallback
        }
        o = dataOfs + sz + (sz & 1) // WORD-aligned chunks
      }
      true
    }
    val out = if (walk(12, end, inMovi = false, depth = 0)) frames.result()
      else Seq.empty
    if (sawMovi && out.nonEmpty) Some(out) else None
  }

  /** REAL frame sampling for video assets: AVI payloads whose frames are
    * MJPEG decode for real — every `stride`-th frame chunk is located by
    * the RIFF walk ([[aviMjpegFrames]]) and its JPEG decoded by the JDK
    * ([[decodeImage]]), yielding true (width, height) and `decoded=true`;
    * anything else (other containers/codecs, malformed files, the corpus
    * fixture's text bytes) keeps the byte-window fallback shape of
    * [[sampleFrames]] with `decoded=false` and −1 dimensions — same
    * explode/partitioning plumbing either way, so the DuckDB twin replays
    * the fallback arm and the spec pins the decoded arm on a fixture AVI.
    *
    * Output: (asset_id, frame_index, byte_offset, frame_len, decoded,
    * width, height) — frame_index counts SAMPLED frames (stride applied). */
  def videoFrames(assets: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    require(frameBytes >= 1, s"videoFrames: frameBytes must be >= 1, got $frameBytes")
    require(stride >= 1, s"videoFrames: stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("frame_len", IntegerType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.filter(col("modality") === "video")
      .select("asset_id", "payload").mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getString(0)
          val payload = r.getAs[Array[Byte]]("payload")
          aviMjpegFrames(payload) match {
            case Some(chunks) =>
              chunks.zipWithIndex.collect {
                case ((ofs, len), i) if i % stride == 0 =>
                  val jpeg = java.util.Arrays.copyOfRange(
                    payload, ofs.toInt, ofs.toInt + len)
                  val img = decodeImage(jpeg)
                  Row(id, i / stride, ofs, len, img.isDefined,
                    img.map(_.getWidth).getOrElse(-1),
                    img.map(_.getHeight).getOrElse(-1))
              }
            case None =>
              // byte-window fallback — the sampleFrames shape, flagged
              val n = if (payload == null) 0 else payload.length
              val nWin = math.max(n / (frameBytes * stride), 1)
              (0 until nWin).map { i =>
                val ofs = i.toLong * stride * frameBytes
                val len = math.max(0, math.min(frameBytes, n - ofs.toInt))
                Row(id, i, ofs, len, false, -1, -1)
              }
          }
        }
      }(enc)
  }

  /** Frame sampling shape for video: emit every `stride`-th "frame" (here: fixed-
    * size byte windows of the payload — the real impl swaps the window iterator
    * for a codec's frame iterator; partitioning/explode shape is identical). */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    assets
      .filter(col("modality") === "video")
      .select(col("asset_id"), col("payload"),
        posexplode(sequence(lit(0),
          greatest((length(col("payload")) / lit(frameBytes * stride)).cast("int") - 1,
            lit(0)))))
      .select(
        col("asset_id"),
        col("pos").cast("int").as("frame_index"),
        (col("col") * stride * frameBytes).cast("long").as("byte_offset"),
        col("payload").substr((col("col") * stride * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame_payload"))
  }
}
