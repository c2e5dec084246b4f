package graft

import org.apache.spark.sql.functions._

/** Unit semantics for the round-13 additions: the UrlOps crawl-shape prelude
  * (scheme-less / protocol-relative / opaque / malformed-port refs) and the
  * capPerKey null-id contract enforcement. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("urlOps prelude: schemeless, protocol-relative, opaque, malformed refs") {
    import graft.functions.UrlOps
    val in = Seq(
      "example.com/page",                 // bare -> http assumed
      "WWW.Ex.com//a/?utm_source=1&b=2",  // bare + www + noise
      "//cdn.example.com/x.js",           // protocol-relative -> http
      "example.com",                      // bare host only -> '/'
      "localhost:8080/x",                 // bare host:port (digit after ':')
      "mailto:a@b.com",                   // opaque -> pass-through, host ''
      "tel:+15551234",                    // opaque -> pass-through
      "data:text/html;base64,AA==",       // opaque -> pass-through
      "http://ex.com:8o80/x",             // malformed port -> pass-through
      "http://ex.com:/x",                 // empty port marker -> pass-through
      "https://[2001:db8::1]:bad/v",      // malformed bracketed port
      "",                                 // empty input -> pass-through
      ":///"                              // garbage -> pass-through (not merged)
    ).toDF("u")
    val out = in.select(UrlOps.canonicalizeUrl(col("u")).as("c"),
        UrlOps.registeredDomain(UrlOps.hostOf(col("u"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == ("http://example.com/page", "example.com"))
    assert(out(1) == ("http://ex.com/a?b=2", "ex.com"))
    assert(out(2) == ("http://cdn.example.com/x.js", "example.com"))
    assert(out(3) == ("http://example.com/", "example.com"))
    assert(out(4) == ("http://localhost:8080/x", "localhost"))
    assert(out(5) == ("mailto:a@b.com", ""))
    assert(out(6) == ("tel:+15551234", ""))
    assert(out(7) == ("data:text/html;base64,AA==", ""))
    assert(out(8) == ("http://ex.com:8o80/x", "ex.com"))
    assert(out(9) == ("http://ex.com:/x", "ex.com"))
    assert(out(10) == ("https://[2001:db8::1]:bad/v", "[2001:db8::1]"))
    assert(out(11) == ("", ""))
    assert(out(12) == (":///", ""))
    // distinct malformed refs must stay distinct dedup keys (the old
    // degenerate ':///'-collapse silently merged them)
    val keys = Seq("mailto:a@b.com", "mailto:c@d.com", ":///x", ":///y").toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).distinct
    assert(keys.length == 4)
  }

  test("capPerKey: null id fails loudly instead of sampling unstably") {
    import graft.operators.CorpusOps
    val rows = Seq(("k", java.lang.Long.valueOf(1L)), ("k", null.asInstanceOf[java.lang.Long]))
      .toDF("k", "id")
    val e = intercept[Exception] {
      CorpusOps.capPerKey(rows, "k", "id", 5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("capPerKey: null id")))
  }
}
