package graft

import graft.sources.{DocConverter, HtmlExtract, UrlFetcher}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.Files
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

/** S2/S3 converter + fetcher: fixture DOCX (zip+OOXML) and PDF (raw + Flate
  * content streams) built in-memory so decode is checked against bytes WE
  * control; the URL fetcher runs against a loopback JDK HttpServer — real
  * HTTP, zero egress. */
class ConverterSpec extends SparkSpec {

  // ---------------------------------------------------------- fixture builders

  private def docxBytes(title: Option[String] = Some("Fixture Title")): Array[Byte] = {
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body>
        |<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Report</w:t></w:r></w:p>
        |<w:p><w:r><w:t>First paragraph</w:t></w:r><w:r><w:t xml:space="preserve"> continues.</w:t></w:r></w:p>
        |<w:p><w:r><w:t>Tabbed</w:t><w:tab/><w:t>value</w:t></w:r></w:p>
        |<w:tbl>
        |<w:tr><w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>h2</w:t></w:r></w:p></w:tc></w:tr>
        |<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr>
        |</w:tbl>
        |<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Details</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val core = title.map(t =>
      s"""<?xml version="1.0"?><cp:coreProperties
         | xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties"
         | xmlns:dc="http://purl.org/dc/elements/1.1/"><dc:title>$t</dc:title>
         |</cp:coreProperties>""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("word/document.xml"))
    z.write(doc.getBytes(UTF_8)); z.closeEntry()
    core.foreach { c =>
      z.putNextEntry(new ZipEntry("docProps/core.xml"))
      z.write(c.getBytes(UTF_8)); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Minimal one-page PDF whose content stream is optionally Flate-compressed:
    * the exact layout a non-incremental writer emits. */
  private def pdfBytes(flate: Boolean, title: Option[String] = None): Array[Byte] = {
    val content = "BT /F1 12 Tf 72 720 Td (Hello, PDF) Tj T* (second \\(line\\)) Tj ET"
    val raw = content.getBytes(ISO_8859_1)
    val payload =
      if (!flate) raw
      else {
        val d = new Deflater()
        d.setInput(raw); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${payload.length}$filter >>\nstream\n")
    bos.write(payload)
    w("\nendstream endobj\n")
    title.foreach(t => w(s"5 0 obj << /Title ($t) /Producer (graft-fixture) >> endobj\n"))
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  // ----------------------------------------------------------------- S2 DOCX

  test("docx: headings, runs, tabs, tables and core title decode") {
    val Right((title, text)) = DocConverter.docxText(docxBytes())
    assert(title.contains("Fixture Title"))
    val lines = text.split("\n").toSeq
    assert(lines.head == "# Report")
    assert(lines.contains("First paragraph continues."))
    assert(lines.contains("Tabbed\tvalue"))
    assert(lines.contains("h1 | h2") && lines.contains("a | b"))
    assert(lines.last == "## Details")
  }

  test("docx: a plain zip without document.xml is an error, not a crash") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("other.txt")); z.write("x".getBytes(UTF_8)); z.closeEntry(); z.close()
    assert(DocConverter.docxText(bos.toByteArray).isLeft)
    assert(DocConverter.docxText("garbage".getBytes(UTF_8)).isLeft)
  }

  // ------------------------------------------------------------------ S2 PDF

  test("pdf: raw and FlateDecode content streams extract the same text") {
    for (flate <- Seq(false, true)) {
      val Right((_, text)) = DocConverter.pdfText(pdfBytes(flate))
      val lines = text.split("\n").toSeq
      assert(lines == Seq("Hello, PDF", "second (line)"), s"flate=$flate got $lines")
    }
  }

  /** A Type0/CID PDF: content stream addresses glyphs by 2-byte CIDs in hex
    * strings; the /ToUnicode CMap (optionally Flate-compressed, like real
    * writers emit) carries bfchar pairs, an incremented bfrange, AND an
    * array-form bfrange — all three dst shapes of the spec. */
  private def pdfType0Bytes(flateCmap: Boolean): Array[Byte] = {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <006C>
        |endbfrange
        |1 beginbfrange
        |<0020> <0021> [<0057> <00E9>]
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end end""".stripMargin
    val cmapRaw = cmap.getBytes(ISO_8859_1)
    val cmapPayload =
      if (!flateCmap) cmapRaw
      else {
        val d = new Deflater()
        d.setInput(cmapRaw); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
    // "Hello" = H e l l o? -> 0001 0002 0010 0010 ... 'o' missing; map via
    // the incremented range instead: 0010->l 0011->m 0012->n. Use
    // "Hel" + "W" + e-acute from the array range on a second line.
    val content =
      "BT /F1 12 Tf <000100020010> Tj T* <00200021> Tj " +
        "<48692C20706C61696E> Tj ET" // odd group count % 4 != 0 -> single-byte path
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >>\nstream\n")
    w(content)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fixture " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${cmapPayload.length}" +
      s"${if (flateCmap) " /Filter /FlateDecode" else ""} >>\nstream\n")
    bos.write(cmapPayload)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  test("pdf: Type0/CID text decodes through the ToUnicode CMap (all dst forms)") {
    for (flate <- Seq(false, true)) {
      val Right((_, text)) = DocConverter.pdfText(pdfType0Bytes(flate))
      val lines = text.split("\n").toSeq
      // bfchar H,e + bfrange-incr l | array-form W + e-acute | single-byte
      // fallback for the non-CID hex string in the same document
      assert(lines == Seq("Hel", "WéHi, plain"), s"flateCmap=$flate got $lines")
    }
  }

  test("pdf: mixed-font hex strings — printable bytes beat a wide bfrange; unmapped CIDs degrade") {
    // identity-style wide bfrange (maps EVERY 2-byte code, incl. 0x4865):
    // the mixed-font hazard — a simple-font ASCII hex string must NOT
    // decode through it into CJK
    val wide = DocConverter.parseToUnicodeCMap(
      "1 beginbfrange\n<0100> <FFFF> <0100>\nendbfrange")
    assert(wide.contains(0x4865))
    val ascii = DocConverter.contentStreamText(
      "BT <48656C6C6F> Tj ET", wide) // "Hello" as bytes
    assert(ascii.trim == "Hello", s"got '$ascii'")
    // genuine CID text (0x00 high bytes -> not printable-as-bytes) still
    // routes through the map
    val cid = DocConverter.parseToUnicodeCMap(
      "2 beginbfchar\n<0001> <0041>\n<0002> <0042>\nendbfchar")
    assert(DocConverter.contentStreamText("BT <00010002> Tj ET", cid).trim == "AB")
    // an unmapped CID inside a mapped string degrades to its printable
    // bytes instead of silently vanishing
    val part = DocConverter.contentStreamText("BT <00014142> Tj ET", cid)
    assert(part.trim == "AAB", s"got '$part'") // 0x0001->A, 0x4142->'AB' bytes
  }

  test("pdf: bfrange parser bounds and precedence") {
    val m = DocConverter.parseToUnicodeCMap(
      """2 beginbfchar
        |<0001> <0041>
        |<0001> <0042>
        |endbfchar
        |1 beginbfrange
        |<0001> <0003> <0061>
        |endbfrange""".stripMargin)
    assert(m(0x0001) == "A") // first mapping wins over later dupes/ranges
    assert(m(0x0002) == "b" && m(0x0003) == "c")
    // surrogate pair dst survives 4-hex chunking
    val sp = DocConverter.parseToUnicodeCMap(
      "1 beginbfchar\n<0005> <D83DDE00>\nendbfchar")
    assert(sp(0x0005) == new String(Character.toChars(0x1F600)))
  }

  test("pdf: /Title surfaces; non-PDF bytes are an error") {
    val Right((title, _)) = DocConverter.pdfText(pdfBytes(flate = true, title = Some("Doc Title")))
    assert(title.contains("Doc Title"))
    assert(DocConverter.pdfText("not a pdf at all".getBytes(UTF_8)).isLeft)
  }

  // ------------------------------------------------- reference-shaped driver API

  test("convert/convertBatch: file routing, missing-file error accumulation") {
    val dir = Files.createTempDirectory("conv").toFile
    val pdf = new java.io.File(dir, "a.pdf")
    Files.write(pdf.toPath, pdfBytes(flate = true))
    val docx = new java.io.File(dir, "b.docx")
    Files.write(docx.toPath, docxBytes())
    val r = DocConverter.convertBatch(Seq(pdf.getPath, docx.getPath, dir + "/missing.pdf"))
    assert(r.documents.map(_.sourceType) == Seq("pdf", "docx"))
    assert(r.documents.head.text.contains("Hello, PDF"))
    assert(r.documents(1).title.contains("Fixture Title"))
    assert(r.errors == Seq(s"File not found: $dir/missing.pdf"))
  }

  test("convertBinaryFrame: binaryFile scan → documents with in-band errors") {
    val dir = Files.createTempDirectory("convbin").toFile
    Files.write(new java.io.File(dir, "a.pdf").toPath, pdfBytes(flate = true))
    Files.write(new java.io.File(dir, "b.docx").toPath, docxBytes())
    Files.write(new java.io.File(dir, "c.pdf").toPath, "broken".getBytes(UTF_8))
    val out = DocConverter.convertBinaryFrame(
      spark.read.format("binaryFile").load(dir.getPath))
      .collect().map(r => (r.getString(0).split('/').last, r.getString(1),
        Option(r.getString(3)), Option(r.getString(4)))).sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq("pdf", "docx", "pdf"))
    assert(out(0)._3.exists(_.contains("Hello, PDF")) && out(0)._4.isEmpty)
    assert(out(1)._3.exists(_.contains("# Report")) && out(1)._4.isEmpty)
    assert(out(2)._3.isEmpty && out(2)._4.exists(_.contains("%PDF-")))
  }

  // -------------------------------------------------------- S3 html extraction

  test("html extraction: chrome dropped, structure kept, links by flag") {
    val html =
      """<html><head><title>T</title><style>.x{}</style></head><body>
        |<nav>Home | About | <a href="/spam">Spam</a></nav>
        |<div id="content"><h1>Main &amp; Title</h1>
        |<p>Opening paragraph.</p>
        |<ul><li>first</li><li><a href="https://ex.org/d">deep link</a></li></ul>
        |</div><footer>&copy; corp</footer></body></html>""".stripMargin
    val md = HtmlExtract.toMarkdown(html, includeLinks = true).get
    assert(md.contains("# Main & Title"))
    assert(md.contains("Opening paragraph."))
    assert(md.contains("- [deep link](https://ex.org/d)"))
    assert(!md.contains("Home | About"), "nav chrome must be removed")
    val plain = HtmlExtract.toMarkdown(html, includeLinks = false).get
    assert(plain.contains("- deep link") && !plain.contains("ex.org"))
  }

  test("html extraction: <main> scoping wins over whole-page stripping") {
    val html = "<body>sidebar junk<main><p>the article body</p></main>more junk</body>"
    val md = HtmlExtract.toMarkdown(html).get
    assert(md == "the article body")
  }

  // --------------------------------------------------- S3 fetcher over loopback

  test("url fetcher: html page, pdf route, and 404 error — against loopback") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(status: Int, ctype: String, body: Array[Byte]): com.sun.net.httpserver.HttpHandler =
      ex => {
        ex.getResponseHeaders.set("Content-Type", ctype)
        if (ex.getRequestMethod == "HEAD") { ex.sendResponseHeaders(status, -1) }
        else { ex.sendResponseHeaders(status, body.length.toLong); ex.getResponseBody.write(body) }
        ex.close()
      }
    server.createContext("/page.html", handler(200, "text/html; charset=utf-8",
      "<html><body><nav>chrome</nav><article><h2>Loopback</h2><p>served locally</p></article></body></html>"
        .getBytes(UTF_8)))
    // content-type is the ONLY pdf signal here — exercises the HEAD probe
    server.createContext("/paper", handler(200, "application/pdf", pdfBytes(flate = true)))
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val f = new UrlFetcher(timeoutMs = 5000)
      val page = f.fetch(s"$base/page.html")
      assert(page.errors.isEmpty && page.documents.head.sourceType == "url")
      assert(page.documents.head.text == "## Loopback\nserved locally")
      val pdf = f.fetch(s"$base/paper")
      assert(pdf.errors.isEmpty && pdf.documents.head.sourceType == "pdf_url")
      assert(pdf.documents.head.text.contains("Hello, PDF"))
      val batch = f.fetchBatch(Seq(s"$base/page.html", s"$base/nope.html"))
      assert(batch.documents.size == 1 && batch.errors.size == 1)
      assert(batch.errors.head.startsWith("Failed to fetch"))
    } finally server.stop(0)
  }
}
