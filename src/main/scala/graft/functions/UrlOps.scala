package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the step every web-corpus pipeline (C4, CCNet,
  * RefinedWeb) runs before URL-keyed dedup or per-domain caps: the same
  * page arrives as `HTTPS://WWW.Site.com:443/a//b/?utm_source=f&z=2&a=1#s`
  * and `https://site.com/a/b?a=1&z=2`, and a byte-equality key treats them
  * as two documents. Canonical form: lowercase scheme + host, `www.`
  * stripped, default port dropped (80/http, 443/https; others kept),
  * duplicate slashes collapsed and the trailing slash stripped (root `/`
  * kept; empty path becomes `/`), fragment dropped, tracking params
  * (`utm_*`, `fbclid`, `gclid`) dropped, surviving query params SORTED.
  *
  * Real crawl URL columns also carry scheme-LESS (`example.com/a`),
  * protocol-relative (`//cdn.example.com/x`), opaque non-hierarchical
  * (`mailto:a@b`), and malformed (`host:8o80/x`) refs. The prelude
  * classifies them (r13): scheme-less and protocol-relative refs assume
  * `http` and canonicalize like any other page ref; opaque refs and any
  * ref whose host or port cannot be extracted PASS THROUGH UNCHANGED —
  * never the old degenerate `:///` key that silently merged every such
  * row into one dedup bucket. [[hostOf]] applies the same prelude, so the
  * per-domain cap keys bare refs by their real host ('' only for opaque/
  * hostless refs, which callers can filter).
  *
  * Everything is codegen'd built-ins (RE2-safe regex — the x28
  * constraint, so no lookahead anywhere) plus the native codegen'd
  * [[org.apache.spark.sql.graft.IdnToAscii]] expression, and the whole
  * pipeline replays verbatim in the DuckDB oracle: same extracts, same
  * replaces, same list sort — IDN punycode encoding is byte-identity on
  * all-ASCII hosts ([[IdnCodec]] contract), so the ASCII-corpus twins need
  * no IDN arm. No UDF, no parser object per row. */
object UrlOps {

  // case-insensitive, and matches valueless params ('?fbclid') too
  private val tracking = "^(?i)(utm_[^=&]*|fbclid|gclid)(=|$)"

  /** Hierarchical ref with an explicit scheme: `scheme://...`. */
  private def hasScheme(u: Column) = u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")

  /** Opaque non-hierarchical ref (`mailto:a@b`, `tel:+1`, `data:text/...`):
    * a scheme-shaped prefix whose colon is followed by neither `//` nor a
    * digit. The digit exclusion keeps `host:8080/x` reading as host:port
    * (a bare ref), not as scheme `host` — RE2-safe in place of the
    * lookahead a PCRE would use. */
  private def isOpaque(u: Column) =
    u.rlike("^[A-Za-z][A-Za-z0-9+.-]*:[^0-9/]") && !hasScheme(u)

  /** The hierarchical URL each classified shape canonicalizes AS: explicit
    * scheme and opaque refs unchanged, `//host/x` and bare `host/x` get
    * `http`. Opaque refs stay scheme-`://`-less here, so every downstream
    * `://`-anchored extract yields '' for them without special-casing. */
  private def effectiveUrl(u: Column): Column =
    when(hasScheme(u) || isOpaque(u), u)
      .when(u.startsWith("//"), concat(lit("http:"), u))
      .otherwise(concat(lit("http://"), u))

  /** Everything before the first '#': the fragment must go FIRST, or a '?'
    * living inside the fragment ('/#/settings?tab=1') is parsed as a query. */
  private def noFrag(u: Column) = regexp_extract(u, "^([^#]*)", 1)

  private def scheme(u: Column) =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Authority without userinfo: 'alice:pw@host:8080' → 'host:8080'.
    * Input must already be an effective (scheme-full) URL. */
  private def hostPort(u: Column) = regexp_replace(
    lower(regexp_extract(noFrag(u), "://([^/?#]*)", 1)), "^[^@]*@", "")

  private def hostOfEff(eff: Column): Column = {
    val hp = hostPort(eff)
    val raw = when(hp.startsWith("["),
        regexp_extract(hp, "^(\\[[^\\]]*\\])", 1))
      .otherwise(regexp_extract(hp, "^([^:]*)", 1))
    idnToAscii(
      regexp_replace(regexp_replace(raw, "^www\\.", ""), "\\.$", ""))
  }

  /** IDN host → punycode ASCII (RFC 3492; `bücher.de` →
    * `xn--bcher-kva.de`), BYTE-IDENTITY on all-ASCII hosts — see
    * [[IdnCodec]]. Real crawls carry raw-Unicode hosts; the PSL's canonical
    * rule form is punycode, so this runs in front of every host-keyed step
    * (it is already composed into [[hostOf]]/[[canonicalizeUrl]] and
    * [[Psl.registeredDomain]]). */
  def idnToAscii(host: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      org.apache.spark.sql.graft.IdnToAscii(
        org.apache.spark.sql.graft.Bridge.expression(host)))

  /** Lowercased host: userinfo dropped, leading `www.` and any trailing
    * FQDN dot stripped; a bracketed IPv6 literal passes through whole.
    * Scheme-less and protocol-relative refs resolve through the same
    * prelude as [[canonicalizeUrl]]; opaque refs yield ''. */
  def hostOf(u: Column): Column = hostOfEff(effectiveUrl(u))

  /** The full canonical URL (see object doc for the normalizations and the
    * pass-through guards: opaque refs, empty host, unparseable port). */
  def canonicalizeUrl(u: Column): Column = {
    val eff = effectiveUrl(u)
    val nf = noFrag(eff)
    val sch = scheme(eff)
    val hp = hostPort(eff)
    val host = hostOfEff(eff)
    val port = when(hp.startsWith("["),
        regexp_extract(hp, "\\]:([0-9]+)$", 1))
      .otherwise(regexp_extract(hp, "^[^:]*:([0-9]+)$", 1))
    // A port marker whose digits don't parse ('host:8o80', 'host:') — two
    // distinct malformed refs must NOT merge with their portless twin.
    val badPort = port === "" &&
      when(hp.startsWith("["), hp.rlike("\\]:")).otherwise(hp.contains(":"))
    val portPart = when(port === "" ||
        (sch === "http" && port === "80") ||
        (sch === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path1 = regexp_replace(
      regexp_extract(nf, "://[^/?#]*([^?#]*)", 1), "/{2,}", "/")
    val pathStripped = regexp_replace(path1, "/$", "")
    val path = when(pathStripped === "", "/").otherwise(pathStripped)
    val params = sort_array(filter(
      split(regexp_extract(nf, "\\?(.*)$", 1), "&"),
      p => p =!= "" && !p.rlike(tracking)))
    val qs = when(size(params) === 0, "")
      .otherwise(concat(lit("?"), array_join(params, "&")))
    when(host === "" || badPort, u)
      .otherwise(concat(sch, lit("://"), host, portPart, path, qs))
  }

  /** ccSLDs where the registrable domain is three labels, not two. A small
    * built-in list, not the full Public Suffix List (zero-egress; the PSL
    * would be a broadcast lookup table in production — same plan shape). */
  private val ccSlds = Seq("co.uk", "org.uk", "ac.uk", "co.jp", "co.in",
    "co.nz", "co.kr", "com.au", "com.br", "com.cn", "com.mx", "com.tw")

  /** Registrable domain of a (canonical, `www.`-less) host: the last two
    * labels, or three when the last two are a listed ccSLD — the grouping
    * key for per-domain caps and domain-level dedup. Hosts with a single
    * label (or none) pass through unchanged. */
  def registeredDomain(host: Column): Column = {
    val l = split(host, "\\.")
    val n = size(l)
    val last2 = concat_ws(".", element_at(l, -2), element_at(l, -1))
    val last3 = concat_ws(".", element_at(l, -3), last2)
    when(n <= 2, host)
      .otherwise(when(last2.isin(ccSlds: _*), last3).otherwise(last2))
  }
}
