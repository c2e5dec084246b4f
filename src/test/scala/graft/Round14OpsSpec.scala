package graft

import org.apache.spark.sql.functions._

/** Unit semantics for the round-14 additions: the PCY bucket-pruned
  * frequent-pair pass (must equal plain A-priori exactly) and the
  * Public-Suffix-List registrable-domain broadcast table (plain / wildcard /
  * exception rules, the implicit '*' default, host==suffix NULLs). */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  test("pcyFrequentPairs equals frequentPairs exactly, incl. hot basket + cap") {
    import graft.operators.FrequentItemsets
    // 6 baskets with real co-occurrence structure + one HOT basket (90) that
    // holds 12 singleton items: its C(12,2)=66 hapax pairs are exactly what
    // the bucket prune exists to drop before the pair shuffle.
    val base = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "d"),
      (4L, "c"), (4L, "d"),
      (5L, "c"), (5L, "d"),
      (6L, "a"), (6L, "a") // duplicate row: multiplicity is not support
    ) ++ (0 until 12).map(i => (90L, s"z$i"))
    val df = base.toDF("b", "i")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // tiny bucket table (8) AND a roomy one (1<<20): the prune must be
    // output-invariant whether every bucket is heavy or almost none is
    for (nBuckets <- Seq(8, 1 << 20)) {
      val apriori = FrequentItemsets.frequentPairs(df, "b", "i", 2L)
      val pcy = FrequentItemsets.pcyFrequentPairs(df, "b", "i", 2L, nBuckets)
      assert(canon(pcy.collect()) == canon(apriori.collect()),
        s"nBuckets=$nBuckets")
    }
    // by hand: (a,b) in baskets {1,2,3} -> support 3; (c,d) in {4,5} -> 2;
    // every other pair (incl. all 66 z-pairs) has support 1 and is dropped
    val got = FrequentItemsets.frequentPairs(df, "b", "i", 2L)
      .select("item_a", "item_b", "support").as[(String, String, Long)]
      .collect().sorted.toSeq
    assert(got == Seq(("a", "b", 3L), ("c", "d", 2L)))
    // hot-basket cap composes identically on both paths
    val capA = FrequentItemsets.frequentPairs(df, "b", "i", 2L, Some(5L))
    val capP = FrequentItemsets.pcyFrequentPairs(df, "b", "i", 2L, 1 << 20, Some(5L))
    assert(canon(capP.collect()) == canon(capA.collect()))
  }

  test("psl registeredDomain: plain, wildcard, exception, default, NULL cases") {
    import graft.functions.Psl
    val rules = Psl.rulesDf(spark, Psl.snapshotRules())
    val hosts = Seq(
      "example.com",            // plain 2-label under listed TLD
      "a.b.example.com",        // deep subdomain -> example.com
      "example.co.uk",          // ccSLD
      "shop.example.co.uk",     // subdomain under ccSLD
      "example.com.au",         // com.au
      "user.github.io",         // private suffix: registrable is user.github.io
      "a.user.github.io",       // deeper -> still user.github.io
      "foo.bar.ck",             // *.ck wildcard: bar.ck is public -> foo.bar.ck
      "www.ck",                 // !www.ck exception: registrable is www.ck
      "sub.www.ck",             // under the exception -> www.ck
      "city.kawasaki.jp",       // !city.kawasaki.jp -> city.kawasaki.jp
      "x.other.kawasaki.jp",    // *.kawasaki.jp -> x.other.kawasaki.jp
      "school.x.sch.uk",        // *.sch.uk -> school.x.sch.uk
      "example.zz",             // unlisted TLD: implicit '*' -> example.zz
      "a.example.zz",           // -> example.zz
      "com",                    // host IS a public suffix -> NULL
      "co.uk",                  // host IS a public suffix -> NULL
      "github.io",              // private suffix itself -> NULL
      "zz",                     // single label, implicit '*' -> NULL
      "EXAMPLE.Co.Uk",          // case-insensitive matching
      "example.com.",           // FQDN trailing dot -> example.com
      "a..com",                 // empty label: malformed -> NULL
      ".com"                    // leading empty label: malformed -> NULL
    ).toDF("host")
    val out = Psl.registeredDomain(hosts, "host", rules, "dom")
      .as[(String, Option[String])].collect().toMap
    assert(out("example.com") == Some("example.com"))
    assert(out("a.b.example.com") == Some("example.com"))
    assert(out("example.co.uk") == Some("example.co.uk"))
    assert(out("shop.example.co.uk") == Some("example.co.uk"))
    assert(out("example.com.au") == Some("example.com.au"))
    assert(out("user.github.io") == Some("user.github.io"))
    assert(out("a.user.github.io") == Some("user.github.io"))
    assert(out("foo.bar.ck") == Some("foo.bar.ck"))
    assert(out("www.ck") == Some("www.ck"))
    assert(out("sub.www.ck") == Some("www.ck"))
    assert(out("city.kawasaki.jp") == Some("city.kawasaki.jp"))
    assert(out("x.other.kawasaki.jp") == Some("x.other.kawasaki.jp"))
    assert(out("school.x.sch.uk") == Some("school.x.sch.uk"))
    assert(out("example.zz") == Some("example.zz"))
    assert(out("a.example.zz") == Some("example.zz"))
    assert(out("com").isEmpty)
    assert(out("co.uk").isEmpty)
    assert(out("github.io").isEmpty)
    assert(out("zz").isEmpty)
    assert(out("EXAMPLE.Co.Uk") == Some("example.co.uk"))
    assert(out("example.com.") == Some("example.com"))
    assert(out("a..com").isEmpty)
    assert(out(".com").isEmpty)
    // agreement with the inline default on its own ccSLD list: every host
    // the small list classifies, the PSL table classifies the same way
    import graft.functions.UrlOps
    val common = Seq("a.example.co.uk", "b.example.com.au", "x.example.co.jp",
      "deep.sub.example.org", "example.net").toDF("host")
    val both = Psl.registeredDomain(common, "host", rules, "dom")
      .select(col("dom"), UrlOps.registeredDomain(col("host")).as("inl"))
      .as[(String, String)].collect()
    both.foreach { case (dom, inl) => assert(dom == inl, s"$dom != $inl") }
  }

  test("psl parser: comments, blanks, exceptions, case, duplicates") {
    import graft.functions.Psl
    val rules = Psl.parseRules(Iterator(
      "// comment", "", "  ", "com", "CO.UK", "*.ck", "!www.ck", "com"))
    assert(rules == Seq(
      Psl.Rule("com", 1, false), Psl.Rule("co.uk", 2, false),
      Psl.Rule("*.ck", 2, false), Psl.Rule("www.ck", 2, true)))
  }
}
