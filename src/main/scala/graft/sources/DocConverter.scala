package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import java.io.ByteArrayInputStream
import java.util.zip.{Inflater, ZipInputStream}
import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

/** One converted document (reference loaders/converter.py:17-24,60-70): the
  * extracted text plus the metadata the reference attaches — source path/URL,
  * detected source type, best-effort title. */
final case class ConvertedDoc(
    source: String, sourceType: String, title: Option[String], text: String)

/** Batch conversion outcome (converter.py ConversionResult): documents that
  * converted plus one error string per failure — a bad file never aborts the
  * batch, it lands in `errors` (converter.py:78-90). */
final case class ConversionResult(
    documents: Seq[ConvertedDoc], errors: Seq[String])

/** S2 document converter (SURVEY §2.1; reference loaders/converter.py): PDF
  * and DOCX → markdown-ish text. The reference delegates to MarkItDown; this
  * is a from-scratch JDK-only decode of the PUBLIC formats —
  *
  *  - DOCX is a ZIP (java.util.zip) of OOXML parts: text lives in
  *    word/document.xml (`w:t` runs inside `w:p` paragraphs, headings tagged
  *    by pStyle), the title in docProps/core.xml (`dc:title`). Parsed with
  *    the JDK's StAX pull parser, external entities disabled.
  *  - PDF text extraction decodes content streams (raw or /FlateDecode via
  *    java.util.zip.Inflater) and replays the text operators (Tj / TJ / ' /
  *    " between BT..ET), with PDF string-escape and hex-string handling.
  *    Composite /Type0 CID text decodes through the file's /ToUnicode
  *    CMaps (bfchar + bfrange, both dst forms — r13): hex-string 2-byte
  *    CIDs that resolve map to real Unicode, which is what every modern
  *    embedded-Unicode-font writer emits. Mixed-font disambiguation: a
  *    hex string whose every byte is printable ASCII is read as a
  *    SIMPLE-font string (byte read beats a wide-bfrange CMap — else
  *    "Hello" turns CJK); in a CMap'd string, an individual unmapped CID
  *    degrades to its printable bytes instead of vanishing; without a
  *    CMap the single-byte printable fallback applies and non-printable
  *    bytes are dropped rather than emitted as mojibake.
  *
  * Defensive bounds follow [[graft.operators.Multimodal]]'s contract: a
  * header-declared size is never trusted — decompression is capped per
  * stream/entry, so a zip bomb or inflate bomb fails the FILE (an `errors`
  * row), not the executor.
  *
  * Scale shape: conversion is per-file and embarrassingly parallel — the
  * distributed surface ([[convertBinaryFrame]]) maps the decoders over
  * `spark.read.format("binaryFile")` rows, one task per file split, no
  * shuffle; the driver-side [[convert]]/[[convertBatch]] mirror the
  * reference's API for ingest scripts. */
object DocConverter {

  /** Per-part decompression cap (zip/inflate-bomb guard): 64 MiB of XML or
    * content stream is far past any real document part. */
  private val MaxDecodedBytes: Int = 64 << 20

  // ------------------------------------------------------------------ DOCX

  /** Decompress one zip entry with the [[MaxDecodedBytes]] cap. */
  private def readEntry(zin: ZipInputStream): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 << 10)
    var n = zin.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size > MaxDecodedBytes) return Left("zip entry exceeds decode cap")
      n = zin.read(buf)
    }
    Right(out.toByteArray)
  }

  /** Hardened StAX reader: DTDs and external entities off (a crafted
    * document.xml must not be able to reach the filesystem or network). */
  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** word/document.xml → markdown-ish text: one line per `w:p` paragraph,
    * `Heading<n>` pStyles become `#`-prefixed headers, table cells join with
    * " | " so row structure survives, `w:tab`/`w:br` become tab/newline. */
  private def docxBodyText(xml: Array[Byte]): String = {
    val r = xmlReader(xml)
    val lines = ArrayBuffer.empty[String]
    val para = new StringBuilder
    var headingLevel = 0
    var inCell = false
    var inRun = false // inside w:t — only run text is visible (a
    // pretty-printed document.xml reports indentation as CHARACTERS too)
    val cells = ArrayBuffer.empty[String]
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "pStyle" =>
                val v = r.getAttributeValue(null, "val") // null ns = any ns
                if (v != null && v.startsWith("Heading"))
                  headingLevel = v.stripPrefix("Heading").toIntOption.getOrElse(1).min(6)
              case "tab" => para.append('\t')
              case "br" => para.append('\n')
              case "tc" => inCell = true
              case "t" => inRun = true
              case _ =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inRun =>
            para.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inRun = false
              case "p" if !inCell =>
                val t = para.result().trim; para.clear()
                if (t.nonEmpty)
                  lines += (if (headingLevel > 0) "#" * headingLevel + " " + t else t)
                headingLevel = 0
              case "p" => // paragraph inside a table cell: space-join
                if (para.nonEmpty) para.append(' ')
              case "tc" =>
                cells += para.result().trim; para.clear(); inCell = false
              case "tr" =>
                lines += cells.mkString(" | "); cells.clear()
              case _ =>
            }
          case _ =>
        }
      }
    } finally r.close()
    lines.mkString("\n")
  }

  /** docProps/core.xml → `dc:title` when present and non-empty. */
  private def docxCoreTitle(xml: Array[Byte]): Option[String] = {
    val r = xmlReader(xml)
    var inTitle = false
    val t = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            inTitle = r.getLocalName == "title"
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inTitle =>
            t.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            inTitle = false
          case _ =>
        }
      }
    } finally r.close()
    Some(t.result().trim).filter(_.nonEmpty)
  }

  /** DOCX bytes → (title, text) or an error string. */
  private[graft] def docxText(bytes: Array[Byte]): Either[String, (Option[String], String)] =
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      var body: Option[String] = None
      var title: Option[String] = None
      try {
        var e = zin.getNextEntry
        while (e != null) {
          e.getName match {
            case "word/document.xml" =>
              body = Some(docxBodyText(readEntry(zin).fold(m => return Left(m), identity)))
            case "docProps/core.xml" =>
              title = docxCoreTitle(readEntry(zin).fold(m => return Left(m), identity))
            case _ =>
          }
          e = zin.getNextEntry
        }
      } finally zin.close()
      body.map(t => Right((title, t)))
        .getOrElse(Left("no word/document.xml entry (not a DOCX?)"))
    } catch { case NonFatal(ex) => Left(s"docx decode failed: ${ex.getMessage}") }

  // ------------------------------------------------------------------- PDF

  /** Inflate with the [[MaxDecodedBytes]] cap; None when the bytes aren't a
    * zlib stream (raw content streams pass through at the caller). */
  private def inflate(data: Array[Byte]): Either[String, Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](64 << 10)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return Left("truncated flate stream")
        out.write(buf, 0, n)
        if (out.size > MaxDecodedBytes) return Left("flate stream exceeds decode cap")
      }
      inf.end()
      Right(out.toByteArray)
    } catch { case NonFatal(ex) => Left(s"inflate failed: ${ex.getMessage}") }

  /** All stream objects as (rawDict, payload) — located lexically
    * (`<<dict>> stream\n …endstream`), which covers non-incremental PDFs
    * without replaying the xref machinery; object streams (/ObjStm) and
    * encrypted files are out of scope and simply yield no text. */
  private def pdfStreams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer.empty[(String, Array[Byte])]
    var from = 0
    while (from < s.length) {
      val i = s.indexOf("stream", from)
      if (i < 0) return out.toSeq
      // keyword must be followed by EOL per spec (and not be "endstream")
      val isEnd = i >= 3 && s.regionMatches(i - 3, "end", 0, 3)
      val afterKw = i + "stream".length
      val dataStart =
        if (afterKw + 1 < s.length && s.charAt(afterKw) == '\r' && s.charAt(afterKw + 1) == '\n') afterKw + 2
        else if (afterKw < s.length && s.charAt(afterKw) == '\n') afterKw + 1
        else -1
      if (!isEnd && dataStart > 0) {
        val end = s.indexOf("endstream", dataStart)
        val dictStart = s.lastIndexOf("<<", i)
        if (end > dataStart && dictStart >= 0) {
          val dict = s.substring(dictStart, i)
          // trailing EOL before "endstream" belongs to the delimiter
          var dataEnd = end
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          out += ((dict, java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)))
          from = end + "endstream".length
        } else from = afterKw
      } else from = afterKw
    }
    out.toSeq
  }

  /** PDF literal-string unescape (spec table 3): `\n \r \t \b \f \( \) \\`,
    * octal `\ddd`, and line-continuation backslash-EOL. */
  private def unescapePdfString(raw: String): String = {
    val out = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '\n' => i += 2
          case '\r' => i += (if (i + 2 < raw.length && raw.charAt(i + 2) == '\n') 3 else 2)
          case d if d >= '0' && d <= '7' =>
            var j = i + 1; var v = 0
            while (j < raw.length && j <= i + 3 && raw.charAt(j) >= '0' && raw.charAt(j) <= '7') {
              v = v * 8 + (raw.charAt(j) - '0'); j += 1
            }
            out.append(v.toChar); i = j
          case other => out.append(other); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    out.result()
  }

  /** Parse a /ToUnicode CMap stream: bfchar pairs and bfrange runs (both
    * dst forms — incremented start code, or explicit array) into a CID →
    * Unicode-string map. Dst hex is UTF-16BE, so 4-hex chunking yields the
    * right chars including surrogate pairs. Bounded: a range wider than
    * 64Ki codes is clamped (a real CMap never needs more; an adversarial
    * one must not allocate unbounded memory). */
  private[graft] def parseToUnicodeCMap(content: String): Map[Int, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    def utf16(hex: String): String =
      hex.grouped(4).filter(_.length == 4)
        .map(h => Integer.parseInt(h, 16).toChar).mkString
    val bfchar = """(?s)beginbfchar(.*?)endbfchar""".r
    val pair = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    for (m <- bfchar.findAllMatchIn(content);
         p <- pair.findAllMatchIn(m.group(1))) {
      val src = Integer.parseInt(p.group(1), 16)
      if (!out.contains(src)) out(src) = utf16(p.group(2))
    }
    val bfrange = """(?s)beginbfrange(.*?)endbfrange""".r
    val range = """(?s)<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[.*?\])""".r
    for (m <- bfrange.findAllMatchIn(content);
         r <- range.findAllMatchIn(m.group(1))) {
      val lo = Integer.parseInt(r.group(1), 16)
      val hi = math.min(Integer.parseInt(r.group(2), 16), lo + 0xFFFF)
      val dst = r.group(3)
      if (dst.startsWith("[")) {
        val singles = """<([0-9A-Fa-f]+)>""".r.findAllMatchIn(dst).toSeq
        singles.zipWithIndex.foreach { case (d, idx) =>
          val src = lo + idx
          if (src <= hi && !out.contains(src)) out(src) = utf16(d.group(1))
        }
      } else {
        val startHex = dst.substring(1, dst.length - 1)
        val base = utf16(startHex)
        if (base.nonEmpty) {
          var c = lo
          while (c <= hi) {
            if (!out.contains(c)) {
              // increment the LAST code unit (the spec's bfrange rule)
              val inc = (base.last + (c - lo)).toChar
              out(c) = base.dropRight(1) + inc
            }
            c += 1
          }
        }
      }
    }
    out.toMap
  }

  /** Replay the text operators of one decoded content stream. Strings
    * accumulate through Tj / ' / " / TJ; Td, TD, T* and ET break lines.
    * `cmap`: the document's merged /ToUnicode map — hex strings whose
    * 2-byte CID groups resolve through it decode to Unicode (the Type0/
    * composite-font path) with per-group printable-byte degradation for
    * unmapped CIDs; an all-printable-byte hex string reads as a simple-font
    * byte string even when a CMap exists (mixed-font disambiguation); with
    * no map the single-byte printable fallback applies. */
  private[graft] def contentStreamText(content: String,
      cmap: Map[Int, String] = Map.empty): String = {
    if (!content.contains("BT")) return ""
    val out = new StringBuilder
    var i = 0
    var pendingLine = new StringBuilder
    def flushLine(): Unit = {
      val t = pendingLine.result()
      if (t.nonEmpty) { out.append(t).append('\n') }
      pendingLine = new StringBuilder
    }
    while (i < content.length) {
      content.charAt(i) match {
        case '(' => // literal string: scan to the matching unescaped ')'
          var j = i + 1; var depth = 1
          val sb = new StringBuilder
          while (j < content.length && depth > 0) {
            val c = content.charAt(j)
            if (c == '\\' && j + 1 < content.length) { sb.append(c).append(content.charAt(j + 1)); j += 2 }
            else {
              if (c == '(') depth += 1 else if (c == ')') depth -= 1
              if (depth > 0) sb.append(c)
              j += 1
            }
          }
          pendingLine.append(unescapePdfString(sb.result()))
          i = j
        case '<' if i + 1 < content.length && content.charAt(i + 1) != '<' =>
          // hex string: 2-byte CIDs through the ToUnicode map when the
          // groups resolve (Type0/composite fonts); single-byte printable
          // pairs otherwise
          val j = content.indexOf('>', i)
          if (j > i) {
            val hex = content.substring(i + 1, j).filterNot(_.isWhitespace)
            def byteVal(h: String): Option[Int] =
              try Some(Integer.parseInt(h, 16))
              catch { case _: NumberFormatException => None }
            // An entirely printable-ASCII byte sequence is a SIMPLE-font
            // string ("Hello" = <48656C6C6F>) — decoding it through a
            // merged CMap with a wide bfrange would turn it into CJK
            // mojibake (the mixed-font file case), so the byte read wins.
            val allPrintable = hex.nonEmpty && hex.length % 2 == 0 &&
              hex.grouped(2).forall(byteVal(_).exists(v => v >= 32 && v < 127))
            if (allPrintable)
              hex.grouped(2).foreach(h => pendingLine.append(byteVal(h).get.toChar))
            else if (cmap.nonEmpty && hex.length % 4 == 0 &&
                hex.grouped(4).exists(g =>
                  byteVal(g).exists(cmap.contains))) {
              // composite-font string: CMap per 2-byte CID; an UNMAPPED CID
              // degrades to its printable bytes instead of vanishing
              hex.grouped(4).foreach { g =>
                cmap.get(byteVal(g).getOrElse(-1)) match {
                  case Some(u) => pendingLine.append(u)
                  case None => g.grouped(2).foreach(h =>
                    byteVal(h).filter(v => v >= 32 && v < 127)
                      .foreach(v => pendingLine.append(v.toChar)))
                }
              }
            } else {
              val padded = if (hex.length % 2 == 1) hex + "0" else hex
              padded.grouped(2).foreach { h =>
                byteVal(h).filter(v => v >= 32 && v < 127)
                  .foreach(v => pendingLine.append(v.toChar))
              }
            }
            i = j + 1
          } else i += 1
        case 'T' if i + 1 < content.length &&
            (content.charAt(i + 1) == '*' ||
              ((content.charAt(i + 1) == 'd' || content.charAt(i + 1) == 'D') &&
                (i + 2 >= content.length || !content.charAt(i + 2).isLetter))) =>
          flushLine(); i += 2
        case 'E' if content.regionMatches(i, "ET", 0, 2) =>
          flushLine(); i += 2
        case _ => i += 1
      }
    }
    flushLine()
    out.result()
  }

  /** `/Title (…)` from the document information dictionary, when present. */
  private def pdfTitle(bytes: Array[Byte]): Option[String] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val i = s.indexOf("/Title")
    if (i < 0) None
    else {
      val p = s.indexOf('(', i)
      val stop = s.indexOf('/', i + 6) // next dict key bounds the search
      if (p < 0 || (stop >= 0 && p > stop)) None
      else {
        var j = p + 1; var depth = 1
        val sb = new StringBuilder
        while (j < s.length && depth > 0) {
          val c = s.charAt(j)
          if (c == '\\' && j + 1 < s.length) { sb.append(c).append(s.charAt(j + 1)); j += 2 }
          else {
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            if (depth > 0) sb.append(c)
            j += 1
          }
        }
        Some(unescapePdfString(sb.result()).trim).filter(_.nonEmpty)
      }
    }
  }

  /** PDF bytes → (title, text) or an error string. */
  private[graft] def pdfText(bytes: Array[Byte]): Either[String, (Option[String], String)] =
    try {
      if (bytes.length < 5 ||
          new String(bytes, 0, 5, java.nio.charset.StandardCharsets.ISO_8859_1) != "%PDF-")
        Left("not a PDF (missing %PDF- header)")
      else {
        val decodedStreams = pdfStreams(bytes).map { case (dict, data) =>
          if (dict.contains("/FlateDecode")) inflate(data).toOption
          else Some(data)
        }.flatten.map(d =>
          new String(d, java.nio.charset.StandardCharsets.ISO_8859_1))
        // Merge every /ToUnicode CMap in the file (2-byte CID → Unicode).
        // Lexical association: without replaying the xref/object graph we
        // cannot tie each CMap to ITS font, so one merged map serves every
        // hex string — exact for the overwhelmingly common one-CID-space
        // writers (each font subset gets disjoint CIDs anyway), first map
        // wins on a genuine collision.
        val cmap = decodedStreams
          .filter(s => s.contains("beginbfchar") || s.contains("beginbfrange"))
          .foldLeft(Map.empty[Int, String])((acc, s) =>
            acc ++ (parseToUnicodeCMap(s) -- acc.keySet))
        val texts = decodedStreams.map(contentStreamText(_, cmap))
        val text = texts.filter(_.nonEmpty).mkString("\n").trim
        Right((pdfTitle(bytes), text))
      }
    } catch { case NonFatal(ex) => Left(s"pdf decode failed: ${ex.getMessage}") }

  // ------------------------------------------------------------ public API

  /** Source-type detection by extension (converter.py:92-100). */
  private[graft] def sourceType(path: String): String = {
    val lower = path.toLowerCase
    if (lower.endsWith(".pdf")) "pdf"
    else if (lower.endsWith(".docx") || lower.endsWith(".doc")) "docx"
    else "unknown"
  }

  /** Bytes + name → converted doc or error (the shared core of the driver
    * and distributed surfaces). */
  private[graft] def convertBytes(source: String, bytes: Array[Byte]): Either[String, ConvertedDoc] = {
    val st = sourceType(source)
    val decoded = st match {
      case "pdf" => pdfText(bytes)
      case "docx" => docxText(bytes)
      case _ =>
        // sniff: DOCX files are zips (PK), PDFs start with %PDF-
        if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == 'K') docxText(bytes)
        else pdfText(bytes)
    }
    decoded.map { case (title, text) => ConvertedDoc(source, st, title, text) }
  }

  /** Reference `DocumentConverter.convert` (converter.py:45-77): one file →
    * result with either a document or an error; a missing file is an error
    * entry, not an exception. */
  def convert(path: String): ConversionResult = {
    val f = new java.io.File(path)
    if (!f.exists()) ConversionResult(Nil, Seq(s"File not found: $path"))
    else convertBytes(path, java.nio.file.Files.readAllBytes(f.toPath)) match {
      case Right(doc) => ConversionResult(Seq(doc), Nil)
      case Left(err) => ConversionResult(Nil, Seq(s"Failed to convert $path: $err"))
    }
  }

  /** Reference `convert_batch` (converter.py:79-90). */
  def convertBatch(paths: Seq[String]): ConversionResult = {
    val results = paths.map(convert)
    ConversionResult(results.flatMap(_.documents), results.flatMap(_.errors))
  }

  /** The distributed S2 surface: a `spark.read.format("binaryFile")` frame
    * (path, content, …) → (source, source_type, title, text, error), one
    * output row per input file — converted rows carry NULL error, failed
    * rows carry NULL text and the reason, so a corpus-scale ingest keeps
    * its audit trail in-band (the [[Loaders.readJsonlRouted]] routing
    * contract). Per-file decode in a deterministic Scala UDF: binary
    * container parsing is exactly the opaque-payload case where codegen
    * expressions stop applying ([[graft.operators.Multimodal]]'s
    * adjudicated pattern); the frame shape keeps one task per file split
    * and no shuffle. */
  def convertBinaryFrame(df: DataFrame, pathCol: String = "path",
      contentCol: String = "content"): DataFrame = {
    val conv = udf { (path: String, bytes: Array[Byte]) =>
      if (bytes == null) (null: String, null: String, "empty payload")
      else convertBytes(path, bytes) match {
        case Right(d) => (d.title.orNull, d.text, null: String)
        case Left(e) => (null: String, null: String, e)
      }
    }
    df.select(col(pathCol).as("source"), col(contentCol).as("_c"))
      .withColumn("_r", conv(col("source"), col("_c")))
      .select(col("source"),
        udf((p: String) => sourceType(p)).apply(col("source")).as("source_type"),
        col("_r._1").as("title"), col("_r._2").as("text"), col("_r._3").as("error"))
  }
}
