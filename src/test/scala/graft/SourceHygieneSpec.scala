package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-file hygiene: every `.scala` file under src/ must be valid UTF-8
  * with no raw control characters. A single stray byte flips `grep` into
  * binary mode, which SILENTLY drops the file from every text audit run over
  * the tree — including leak/copy scans, where an unscanned file reads as a
  * clean file (r15: a literal NUL inside a string in Embedder.scala did
  * exactly that for four rounds). A backslash-u escape in the string literal expresses the
  * same runtime value without poisoning the file. */
class SourceHygieneSpec extends AnyFunSuite {

  test("every .scala source file is valid UTF-8 with no raw control chars") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src")
    val scalaFiles = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
    assert(scalaFiles.size > 50, s"suspiciously few sources: ${scalaFiles.size}")
    val decoder = () => java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val bad = scalaFiles.flatMap { p =>
      val bytes = java.nio.file.Files.readAllBytes(p)
      val utf8 =
        try { decoder().decode(java.nio.ByteBuffer.wrap(bytes)); None }
        catch { case e: java.nio.charset.CharacterCodingException =>
          Some(s"$p: invalid UTF-8 ($e)") }
      // raw control bytes other than \t \n \r — anything here turns grep
      // binary regardless of UTF-8 validity
      val ctrl = bytes.indexWhere(b =>
        b >= 0 && b < 0x20 && b != '\t' && b != '\n' && b != '\r')
      val ctrlMsg =
        if (ctrl >= 0) Some(f"$p: raw control byte 0x${bytes(ctrl)}%02x at offset $ctrl")
        else None
      utf8.toSeq ++ ctrlMsg.toSeq
    }
    assert(bad.isEmpty, "non-text source files (invisible to grep audits):\n" +
      bad.mkString("\n"))
  }
}
