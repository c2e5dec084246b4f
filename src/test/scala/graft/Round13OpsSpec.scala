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

  test("nn-descent consumers: mutualKnnFrom/knnDensityFrom agree with exact at graph recall") {
    import graft.operators.{NnDescent, VectorSearch}
    // 12 points, 3 tight clusters; n < 32 puts everything in ONE init bucket,
    // so the graph is exact by construction (recall 1.0) and the consumer
    // outputs must be BIT-equal to the n²-scan operators.
    val pts = Seq(
      ("a1", Array(1.0f, 0.01f, 0f, 0f)), ("a2", Array(1.0f, 0.02f, 0f, 0f)),
      ("a3", Array(1.0f, 0.03f, 0f, 0f)), ("a4", Array(1.0f, 0.04f, 0f, 0f)),
      ("b1", Array(0f, 1.0f, 0.01f, 0f)), ("b2", Array(0f, 1.0f, 0.02f, 0f)),
      ("b3", Array(0f, 1.0f, 0.03f, 0f)), ("b4", Array(0f, 1.0f, 0.04f, 0f)),
      ("c1", Array(0f, 0f, 1.0f, 0.01f)), ("c2", Array(0f, 0f, 1.0f, 0.02f)),
      ("c3", Array(0f, 0f, 1.0f, 0.03f)), ("c4", Array(0f, 0f, 1.0f, 0.04f))
    ).toDF("id", "v")
    val g = NnDescent.knnGraph(pts, "id", "v", k = 3, rounds = 2)
      .localCheckpoint(true)
    val rec = NnDescent.recallAtK(pts, "id", "v", 3, g, sampleMod = 1)
    assert(rec == 1.0, s"single-bucket fixture must be exact, recall=$rec")
    def edges(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    val exactMut = edges(VectorSearch.mutualKnn(pts, "id", "v", 3))
    val approxMut = edges(VectorSearch.mutualKnnFrom(g))
    assert(exactMut.nonEmpty && approxMut == exactMut)
    def dens(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val de = dens(VectorSearch.knnDensity(pts, "id", "v", 3))
    val da = dens(VectorSearch.knnDensityFrom(g))
    assert(da == de) // bit-equal: same lists, same sorted fold order
    // allIds: a node missing from the graph surfaces as k_eff = 0, not a
    // silently lost row
    val surfaced = VectorSearch.knnDensityFrom(
        g.filter(col("id") =!= "a1"), Some(pts.select("id")))
      .filter(col("id") === "a1").collect()
    assert(surfaced.length == 1 && surfaced(0).getLong(1) == 0L &&
      surfaced(0).isNullAt(2))
    org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(g)
  }

  test("textRank: hand-computed two-iteration scores, rank order, dropouts") {
    import graft.operators.TextRank
    val docs = Seq(("d1", "a b a c"), ("d2", "solo"), ("d3", "")).toDF("id", "text")
    val out = TextRank.keywords(docs, "id", "text", topK = 5, iterations = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // d1 graph: {a-b, a-c}; deg a=2, b=1, c=1. Hand-replay of the exact
    // double arithmetic (init 1.0, ordered neighbor folds):
    val d = 0.85
    val tA1 = (1.0 - d) + d * (0.0 + 1.0 / 1 + 1.0 / 1) // nbrs b, c
    val tB1 = (1.0 - d) + d * (0.0 + 1.0 / 2)           // nbr a
    val tA2 = (1.0 - d) + d * (0.0 + tB1 / 1 + tB1 / 1)
    val tB2 = (1.0 - d) + d * (0.0 + tA1 / 2)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("d1", 1, "a"), ("d1", 2, "b"), ("d1", 3, "c"))) // b before c on tie
    assert(out(0)._4 == tA2 && out(1)._4 == tB2 && out(2)._4 == tB2)
    // single-token and empty docs have no co-occurrence node: no rows, by doc
    assert(!out.exists(t => t._1 == "d2" || t._1 == "d3"))
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
