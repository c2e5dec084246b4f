package graft.functions

import java.util.Locale

/** Deterministic IDN → ASCII (punycode) host normalization — RFC 3492's
  * encoder, from the published specification (public algorithm; the JDK's
  * `java.net.IDN` exists but throws on malformed labels, and a crawl
  * pipeline needs a TOTAL function: anything unencodable passes through
  * unchanged rather than killing the task).
  *
  * Contract (load-bearing for the oracle twins): a pure-ASCII host is
  * returned BYTE-IDENTICAL — no lowercasing, no trimming — so composing
  * this in front of [[UrlOps]]/[[Psl]] changes nothing on ASCII corpora
  * (x37/x38/x40 oracles replay unchanged). Non-ASCII labels are lowercased
  * (Locale.ROOT — the deterministic simplification of nameprep's casefold)
  * and punycode-encoded with the `xn--` ACE prefix; ASCII labels inside a
  * mixed host stay untouched. Callers wanting the IDNA canonical form
  * lowercase first (both composition points already do).
  *
  * Reference behavior anchor: the PSL's canonical rule form is punycode
  * (publicsuffix.org list format), so IDN hosts must be ACE-encoded before
  * [[Psl.registeredDomain]]'s rule join can match them.
  */
object IdnCodec {

  // RFC 3492 §5 parameter values
  private final val Base = 36
  private final val TMin = 1
  private final val TMax = 26
  private final val Skew = 38
  private final val Damp = 700
  private final val InitialBias = 72
  private final val InitialN = 128

  /** RFC 3492 §6.1 bias adaptation. */
  private def adapt(delta0: Long, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (((Base - TMin + 1) * delta) / (delta + Skew)).toInt
  }

  private def digitChar(d: Long): Char =
    if (d < 26) ('a' + d).toChar else ('0' + (d - 26)).toChar

  /** RFC 3492 §6.3 encode of one label (no ACE prefix). Labels longer than
    * 256 code points return null (encoded forms would exceed DNS's 63-octet
    * label bound anyway); the caller passes the original through. */
  private[graft] def encodeLabel(label: String): String = {
    val cps = label.codePoints().toArray
    if (cps.length > 256) return null
    val out = new java.lang.StringBuilder
    cps.foreach(c => if (c < 0x80) out.append(c.toChar))
    val basicLen = out.length()
    if (basicLen > 0) out.append('-')
    var n = InitialN.toLong
    var delta = 0L
    var bias = InitialBias
    var h = basicLen
    while (h < cps.length) {
      var m = Long.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c.toLong)
      delta += (m - n) * (h + 1)
      n = m
      var i = 0
      while (i < cps.length) {
        val c = cps(i).toLong
        if (c < n) delta += 1
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin
              else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, h + 1, h == basicLen)
          delta = 0
          h += 1
        }
        i += 1
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  /** RFC 3492 §6.2 decode of one punycode label (no ACE prefix) — the
    * encoder's inverse, kept primarily as the round-trip correctness guard
    * (Round15OpsSpec property: decode(encode(l)) == l for arbitrary
    * lowercase labels). Returns null on malformed input (bad digit,
    * overflow) — total, like [[toAscii]]. */
  private[graft] def decodeLabel(label: String): String = {
    val d = label.lastIndexOf('-')
    val basic = if (d > 0) label.substring(0, d) else ""
    if (basic.exists(_ >= 0x80)) return null
    val ext = if (d >= 0) label.substring(d + 1) else label
    val out = new java.util.ArrayList[Integer]()
    basic.foreach(c => out.add(c.toInt))
    var n = InitialN.toLong
    var i = 0L
    var bias = InitialBias
    var p = 0
    while (p < ext.length) {
      val oldi = i
      var w = 1L
      var k = Base
      var done = false
      while (!done) {
        if (p >= ext.length) return null // truncated variable-length integer
        val c = ext.charAt(p); p += 1
        val digit = if (c >= 'a' && c <= 'z') c - 'a'
          else if (c >= '0' && c <= '9') c - '0' + 26
          else if (c >= 'A' && c <= 'Z') c - 'A'
          else return null
        i += digit * w
        if (i > Int.MaxValue) return null
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (digit < t) done = true
        else {
          w *= Base - t
          if (w > Int.MaxValue) return null
          k += Base
        }
      }
      bias = adapt(i - oldi, out.size + 1, oldi == 0)
      n += i / (out.size + 1)
      if (n > 0x10FFFF) return null
      i %= out.size + 1
      out.add(i.toInt, n.toInt)
      i += 1
    }
    val sb = new java.lang.StringBuilder
    out.forEach(cp => sb.appendCodePoint(cp))
    sb.toString
  }

  /** ASCII form of `host`: identity when already all-ASCII (byte-identical
    * — see object doc), else each non-ASCII label lowercased and
    * ACE-encoded. Null-safe; labels that fail to encode pass through. */
  def toAscii(host: String): String = {
    if (host == null) return null
    var allAscii = true
    var i = 0
    while (allAscii && i < host.length) {
      if (host.charAt(i) >= 0x80) allAscii = false
      i += 1
    }
    if (allAscii) return host
    host.split("\\.", -1).map { label =>
      if (label.forall(_ < 0x80)) label
      else {
        val enc = encodeLabel(label.toLowerCase(Locale.ROOT))
        if (enc == null) label else "xn--" + enc
      }
    }.mkString(".")
  }

  /** UTF8String shim for codegen call sites ([[org.apache.spark.sql.graft.IdnToAscii]]). */
  def toAsciiUtf8(host: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    if (host == null) return null
    val s = host.toString
    val a = toAscii(s)
    // all-ASCII fast path returns the SAME string; reuse the input buffer
    if (a eq s) host else org.apache.spark.unsafe.types.UTF8String.fromString(a)
  }
}
