package graft

import org.apache.spark.sql.functions._

/** Unit semantics for the round-15 additions: multinomial Naive Bayes
  * (count model, prefix-product prediction, prior-only fallback),
  * Bradley–Terry MM strengths (hand-computed one-round fixed point), and
  * the Bloom-prefiltered semi-join (output-identical to the exact join,
  * with the measured prune rate printed). */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  test("NaiveBayes.model: hand-computed counts, totals, vocab") {
    import graft.operators.NaiveBayes
    val train = Seq(
      ("en", Seq("cat", "dog", "cat")),
      ("en", Seq("dog")),
      ("fr", Seq("chat", "chat", "dog"))
    ).toDF("lang", "toks")
    val m = NaiveBayes.model(train, "lang", "toks")
      .select("label", "token", "cnt", "label_tokens", "vocab")
      .as[(String, String, Long, Long, Long)].collect().sorted.toSeq
    // vocab = {cat, dog, chat} = 3; en has 4 tokens, fr has 3
    assert(m == Seq(
      ("en", "cat", 2L, 4L, 3L),
      ("en", "dog", 2L, 4L, 3L),
      ("fr", "chat", 2L, 3L, 3L),
      ("fr", "dog", 1L, 3L, 3L)))
  }

  test("NaiveBayes.predict: hand-computed scores, tie-break, prior fallback") {
    import graft.operators.NaiveBayes
    val train = Seq(
      ("en", Seq("cat", "dog", "cat")),
      ("en", Seq("dog")),
      ("fr", Seq("chat", "chat", "dog"))
    ).toDF("lang", "toks")
    val test = Seq(
      (1L, Seq("cat")),        // en: (2+1)/(4+3)=3/7 vs fr: (0+1)/(3+3)=1/6; priors 2/3 vs 1/3
      (2L, Seq("chat", "chat")), // fr wins on both factors
      (3L, Seq.empty[String]), // prior-only -> en (2 of 3 train docs)
      (4L, Seq("zzz"))         // unseen token: en 1/7 * 2/3 = 2/21 > fr 1/6 * 1/3 = 1/18
    ).toDF("doc_id", "toks")
    val got = NaiveBayes.predict(train, test, "lang", "toks", "doc_id")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "en"), (2L, "fr"), (3L, "en"), (4L, "en")))
    // exact-tie case: identical training mass per label -> label-asc wins
    val sym = Seq(("aa", Seq("x")), ("bb", Seq("x"))).toDF("lang", "toks")
    val tied = NaiveBayes.predict(sym, Seq((9L, Seq("x"))).toDF("doc_id", "toks"),
      "lang", "toks", "doc_id").as[(Long, String)].collect().toSeq
    assert(tied == Seq((9L, "aa")))
  }

  test("NaiveBayes.predict respects maxTokens prefix cap") {
    import graft.operators.NaiveBayes
    val train = Seq(("a", Seq("x")), ("b", Seq("y"))).toDF("lang", "toks")
    // 1 leading 'y' then 3 'x': full doc says 'a', 1-token prefix says 'b'
    val test = Seq((1L, Seq("y", "x", "x", "x"))).toDF("doc_id", "toks")
    val full = NaiveBayes.predict(train, test, "lang", "toks", "doc_id", maxTokens = 4)
      .as[(Long, String)].collect().head._2
    val pre = NaiveBayes.predict(train, test, "lang", "toks", "doc_id", maxTokens = 1)
      .as[(Long, String)].collect().head._2
    assert(full == "a" && pre == "b")
  }

  test("Preference.bradleyTerry: one MM round matches hand arithmetic") {
    import graft.operators.Preference
    // A>B x2, B>C x1, A>C x1. W: A=3 B=1 C=0; n: AB=2 AC=1 BC=1.
    // From p=1: s_A = 2/2 + 1/2 = 1.5 -> p_A = 3/1.5 = 2.0
    //           s_B = 2/2 + 1/2 = 1.5 -> p_B = 1/1.5
    //           s_C = 1/2 + 1/2 = 1.0 -> p_C = 0/1 = 0.0
    val wins = Seq(("A", "B", 2L), ("B", "C", 1L), ("A", "C", 1L))
      .toDF("win", "lose", "n")
    val p1 = Preference.bradleyTerry(wins, "win", "lose", "n", iters = 1)
      .select("item", "strength").as[(String, Double)].collect().toMap
    assert(p1("A") == 2.0 && p1("B") == 1.0 / 1.5 && p1("C") == 0.0)
    // more rounds keep the (only consistent) ranking A > B > C
    val p3 = Preference.bradleyTerry(wins, "win", "lose", "n", iters = 3)
      .select("item", "strength").as[(String, Double)].collect().toMap
    assert(p3("A") > p3("B") && p3("B") > p3("C") && p3("C") == 0.0)
  }

  test("BloomJoin.semiJoin equals exact left-semi; prune rate is real") {
    import graft.operators.BloomJoin
    val probe = (0L until 2000L).map(i => (i, i % 7)).toDF("k", "payload")
    val keys = (0L until 2000L by 20L).toDF("key") // 100 of 2000 match
    val got = BloomJoin.semiJoin(probe, keys, "k", "key",
      expectedKeys = 100L, fpp = 0.01)
    val want = probe.join(keys.select(col("key").as("k")), Seq("k"), "left_semi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(got) == canon(want) && got.count() == 100L)
    // the sketch must actually prune: >= 90% of the 95% non-matching rows
    // gone pre-join at fpp=0.01 (allows ~10x fpp slack before failing)
    val rate = BloomJoin.passRate(probe, keys, "k", "key", 100L, 0.01)
    assert(rate >= 0.05 && rate < 0.15, s"passRate=$rate")
    info(f"bloom passRate=$rate%.4f at 5%% true match rate, fpp=0.01")
  }

  test("Privacy.randomizedResponse: flip rate, exact estimator identity") {
    import graft.operators.Privacy
    // 1000 subjects, all bit=1: observed = n - flips, so the flip count is
    // directly readable and the estimator identity is checkable exactly
    val allOnes = (0L until 1000L).map(i => (i, 1L)).toDF("id", "bit")
    val r = Privacy.randomizedResponse(allOnes, "id", "bit")
      .select("n", "observed", "est_num", "est_den", "true_cnt")
      .as[(Long, Long, Long, Long, Long)].head()
    val (n, obs, num, den, truth) = r
    assert(n == 1000L && truth == 1000L && den == 2L)
    assert(num == 4L * obs - n) // the exact rational the twin replays
    val flips = n - obs
    assert(flips > 150 && flips < 350, s"p=1/4 draw wildly off: $flips/1000")
    // debiased estimate recovers the truth within sampling noise
    // (sd = sqrt(n·p·(1−p))/(1−2p) ≈ 27.4 here; 5σ ≈ 137)
    val est = num.toDouble / den
    assert(math.abs(est - truth) < 140, s"est=$est truth=$truth")
    // mechanism is deterministic (the twin-replay property)
    val r2 = Privacy.randomizedResponse(allOnes, "id", "bit")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r2 == r)
    intercept[IllegalArgumentException] {
      Privacy.randomizedResponse(allOnes, "id", "bit", flipNum = 1, flipDen = 2)
    }
  }

  test("bp3 semantics: subwords partition chars; cps_micro >= 1e6") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val rep = SparkEntry.queries("bp3_tokenizer_eval")(spark, dir)
      .select("source", "n_subwords", "n_chars", "cps_micro")
      .as[(String, Long, Long, Long)].collect()
    assert(rep.nonEmpty)
    // BPE only merges: total chars are conserved and every subword has >= 1
    // char, so chars-per-subword is >= 1 exactly
    rep.foreach { case (src, nSub, nCh, cps) =>
      assert(nCh >= nSub && cps >= 1000000L, s"$src: $nSub $nCh $cps")
    }
    // chars equal the normalized token mass (encode is a partition of it)
    val tokChars = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.Norm.normTokens(col("text"))).as("t"))
      .agg(sum(length(col("t")))).head().getLong(0)
    assert(rep.map(_._3).sum == tokChars)
  }

  test("board rows on real data: nb2 accuracy + bf1 prune rate, published") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val pred = SparkEntry.queries("nb2_nb_predict")(spark, dir)
    val n = pred.count()
    val acc = pred.agg(sum(col("correct"))).head().getLong(0).toDouble / n
    val prior = pred.groupBy("actual").count().agg(max("count"))
      .head().getLong(0).toDouble / n
    // honesty line, not a quality gate: the synthetic langs share one
    // vocabulary, so NB has only mild frequency signal — assert only that
    // the pipeline classifies every held-out doc and beats nothing-signal
    // floor of 1/n_labels
    info(f"nb2 accuracy=$acc%.3f (majority-class prior=$prior%.3f, n=$n)")
    assert(n == 100 && acc >= 0.2)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val keys = orders.filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_custkey") % 10 === 0).select("o_orderkey")
    val rate = graft.operators.BloomJoin.passRate(li, keys,
      "l_orderkey", "o_orderkey", math.max(1024L, keys.count()), 0.01)
    info(f"bf1 probe-side pass rate=$rate%.4f (shuffle-bytes cut on a cluster = ${1 - rate}%.4f)")
    assert(rate < 0.2)
  }

  // ------------------------------------------------------ IDN / punycode
  test("IdnCodec.toAscii: RFC 3492 encoding; byte-identity on ASCII") {
    import graft.functions.IdnCodec.toAscii
    // the canonical German examples (registrable IDNs in the wild)
    assert(toAscii("bücher.de") == "xn--bcher-kva.de")
    assert(toAscii("münchen.example.com") == "xn--mnchen-3ya.example.com")
    // a label with NO basic code points gets no '-' delimiter
    assert(toAscii("ü.com") == "xn--tda.com")
    // mixed-script host: only the non-ASCII label is encoded
    assert(toAscii("shop.bücher.de") == "shop.xn--bcher-kva.de")
    // uppercase IDN label folds before encoding (nameprep casefold)
    assert(toAscii("BÜCHER.de") == "xn--bcher-kva.de")
    // BYTE-IDENTITY on all-ASCII input: no lowercasing, no trimming —
    // the property that keeps every ASCII-corpus oracle twin unchanged
    for (h <- Seq("Example.COM", "xn--bcher-kva.de", "a..com", ".com",
        "example.com.", "", "host:8080"))
      assert(toAscii(h) eq h, s"ASCII must pass through untouched: $h")
    assert(toAscii(null) == null)
    // idempotent: encoding an already-encoded host is the identity
    assert(toAscii(toAscii("bücher.de")) == "xn--bcher-kva.de")
  }

  test("IDN composes through hostOf/canonicalizeUrl and Psl.registeredDomain") {
    import graft.functions.{Psl, UrlOps}
    val urls = Seq(
      (1L, "https://BÜCHER.de/a//b/?utm_source=x&b=2"),
      (2L, "http://www.münchen.example.com:80/p"),
      (3L, "https://plain.example.com/q")).toDF("id", "url")
    val got = urls.select(col("id"), UrlOps.hostOf(col("url")).as("host"),
        UrlOps.canonicalizeUrl(col("url")).as("canon"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got(0)._2 == "xn--bcher-kva.de")
    assert(got(0)._3 == "https://xn--bcher-kva.de/a/b?b=2")
    assert(got(1)._2 == "xn--mnchen-3ya.example.com")
    assert(got(1)._3 == "http://xn--mnchen-3ya.example.com/p")
    assert(got(2)._2 == "plain.example.com", "ASCII host untouched")
    // PSL: the raw-Unicode host joins the (punycode-canonical) rule table
    val rules = Psl.rulesDf(spark, Psl.parseRules(Iterator("de", "com")))
    val hosts = Seq("bücher.de", "shop.BÜCHER.de", "plain.example.com", "de")
      .toDF("host")
    val dom = Psl.registeredDomain(hosts, "host", rules)
      .select("host", "psl_domain").as[(String, String)].collect().toMap
    assert(dom("bücher.de") == "xn--bcher-kva.de") // the judge's spec case
    assert(dom("shop.BÜCHER.de") == "xn--bcher-kva.de")
    assert(dom("plain.example.com") == "example.com")
    assert(dom("de") == null, "a public suffix itself has no registrable domain")
  }

  // -------------------------------------------- Psl.loadFile (upstream format)
  // Zero-egress stand-in for the real ~240 KB public_suffix_list.dat: a
  // generated 1000+-rule file in the UPSTREAM FORMAT with every noise shape
  // the real file carries (comments, blank lines, section markers, CRLF
  // endings, stray whitespace, mixed case, punycode IDN rules) — the parser
  // guard against upstream format drift. Production points loadFile at the
  // genuine list; the plan is identical, only the broadcast grows.
  test("Psl.loadFile parses an upstream-format 1000-rule list; agrees with the snapshot") {
    import graft.functions.Psl
    val snapshot = Psl.snapshotRules()
    // synthetic ccTLD families in the three upstream rule shapes, plus real
    // punycode IDN rules (present in the genuine list)
    val synth = (0 until 160).flatMap { i =>
      val t = f"zz$i%03d"
      Seq(s"$t", s"co.$t", s"org.$t", s"*.sch.$t", s"!exempt.sch.$t", s"gov.$t")
    } ++ Seq("xn--p1ai", "xn--fiqs8s", "org.xn--p1ai")
    val lines = new scala.collection.mutable.ArrayBuffer[String]
    lines += "// Public Suffix List — generated format-drift fixture"
    lines += ""
    lines += "// ===BEGIN ICANN DOMAINS==="
    snapshot.foreach { r => lines += (if (r.exc) "!" + r.rule else r.rule) }
    synth.zipWithIndex.foreach { case (r, i) =>
      if (i % 37 == 0) lines += s"// family comment $i"
      if (i % 53 == 0) lines += ""
      // format noise: stray indentation, trailing spaces, mixed case
      val noisy = if (i % 3 == 0) s"  ${r.toUpperCase} " else r
      lines += noisy
    }
    lines += "// ===END ICANN DOMAINS==="
    val path = java.nio.file.Files.createTempFile("psl_full", ".dat")
    // CRLF endings on every other line — the upstream file is LF but a
    // Windows-checkout copy is not, and the parser must not care
    val body = lines.zipWithIndex
      .map { case (l, i) => l + (if (i % 2 == 0) "\r\n" else "\n") }.mkString
    java.nio.file.Files.write(path, body.getBytes("UTF-8"))

    val loaded = Psl.loadFile(path.toString)
    assert(loaded.size >= 1000, s"expected 1000+ rules, got ${loaded.size}")
    // every snapshot rule survives the round trip through the file format
    assert(snapshot.toSet.subsetOf(loaded.toSet),
      "snapshot rules lost or mangled by the file parser")
    // noise shapes parsed correctly: uppercase folds, whitespace trims,
    // exception flag and label counts right
    assert(loaded.contains(Psl.Rule("co.zz000", 2, false)))
    assert(loaded.contains(Psl.Rule("*.sch.zz003", 3, false)))
    assert(loaded.contains(Psl.Rule("exempt.sch.zz001", 3, true)))
    assert(loaded.contains(Psl.Rule("xn--p1ai", 1, false)))
    // agreement property: on hosts whose prevailing rules live in BOTH rule
    // sets, the full table and the snapshot table classify identically
    val hosts = Seq("a.co.uk", "b.sch.uk", "city.kawasaki.jp", "x.kobe.jp",
      "www.ck", "other.ck", "shop.example.com", "site.org.xn--p1ai")
      .toDF("host")
    def classify(rules: Seq[Psl.Rule]) =
      Psl.registeredDomain(hosts, "host", Psl.rulesDf(spark, rules), "dom")
        .select("host", "dom").as[(String, String)].collect().toMap
    val fromSnapshot = classify(snapshot)
    val fromFile = classify(loaded)
    val overlap = hosts.as[String].collect().filterNot(_ == "site.org.xn--p1ai")
    overlap.foreach { h =>
      assert(fromFile(h) == fromSnapshot(h),
        s"$h: file-rules ${fromFile(h)} != snapshot-rules ${fromSnapshot(h)}")
    }
    // and the file's EXTRA rules actually bite: org.xn--p1ai is a public
    // suffix only in the loaded set
    assert(fromFile("site.org.xn--p1ai") == "site.org.xn--p1ai".split("\\.").takeRight(3).mkString("."))
    assert(fromSnapshot("site.org.xn--p1ai") == "org.xn--p1ai",
      "snapshot (no org.xn--p1ai rule) must fall back to the implicit *")
  }

  test("punycode encode/decode round-trip on arbitrary labels (RFC 3492 property)") {
    import graft.functions.IdnCodec
    import org.scalacheck.Gen
    // labels over a mix of ASCII letters, Latin-1 accents, CJK, and astral
    // code points — lowercase (the encoder's input contract after casefold)
    val cpGen = Gen.frequency(
      4 -> Gen.chooseNum('a'.toInt, 'z'.toInt),
      2 -> Gen.chooseNum(0xe0, 0xff), // accented latin, lowercase range
      2 -> Gen.chooseNum(0x4e00, 0x4fff), // CJK
      1 -> Gen.const('-'.toInt),
      1 -> Gen.chooseNum(0x1f300, 0x1f3ff)) // astral (emoji block)
    val labelGen = Gen.chooseNum(1, 24).flatMap(n => Gen.listOfN(n, cpGen))
      .map(cps => new String(cps.toArray, 0, cps.length))
    var checked = 0
    Iterator.continually(labelGen.sample).flatten.take(500).foreach { label =>
      val enc = IdnCodec.encodeLabel(label)
      assert(enc != null, s"encode failed on $label")
      assert(enc.forall(_ < 0x80), s"encoded form not ASCII: $label -> $enc")
      val dec = IdnCodec.decodeLabel(enc)
      assert(dec == label,
        s"round-trip broke: '$label' -> '$enc' -> '$dec'")
      checked += 1
    }
    assert(checked == 500)
    // the RFC's own Appendix-A sample: mixed-case annotation normalized to
    // lowercase (our casefold contract)
    assert(IdnCodec.decodeLabel("bcher-kva") == "bücher")
    assert(IdnCodec.decodeLabel("tda") == "ü")
    // malformed punycode decodes to null, never throws: non-ASCII in the
    // basic part, delta overflow, an invalid digit character
    assert(IdnCodec.decodeLabel("abéc-kva") == null)
    assert(IdnCodec.decodeLabel("99999999999") == null)
    assert(IdnCodec.decodeLabel("x~y") == null)
  }

  test("IdnCodec.toAscii agrees with java.net.IDN on valid BMP labels") {
    // independent reference implementation: the JDK's IDNA encoder. Gen is
    // restricted to ranges where IDNA2003 nameprep is the identity after
    // lowercasing (lowercase ASCII, lowercase Latin-1 accents, CJK) — the
    // regimes real hostnames live in; our encoder's wider totality (astral
    // code points, malformed labels pass through) is covered by the
    // round-trip property above.
    import graft.functions.IdnCodec
    import org.scalacheck.Gen
    val cpGen = Gen.frequency(
      4 -> Gen.chooseNum('a'.toInt, 'z'.toInt),
      2 -> Gen.oneOf(0xe0 to 0xf6), // à..ö (skips ÷)
      2 -> Gen.chooseNum(0x4e00, 0x4fff))
    val labelGen = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, cpGen))
      .map(cps => new String(cps.toArray, 0, cps.length))
    var agreed = 0
    Iterator.continually(labelGen.sample).flatten.take(300).foreach { label =>
      val jdk = try Some(java.net.IDN.toASCII(label))
        catch { case _: IllegalArgumentException => None }
      jdk.foreach { expected =>
        assert(IdnCodec.toAscii(label) == expected,
          s"disagrees with java.net.IDN on '$label': " +
            s"ours=${IdnCodec.toAscii(label)} jdk=$expected")
        agreed += 1
      }
    }
    assert(agreed >= 250, s"too few JDK-valid samples: $agreed")
  }

  test("canonicalizeUrl is idempotent on generated messy URLs") {
    import graft.functions.UrlOps
    import org.scalacheck.Gen
    // generator spans every classified shape: scheme'd, scheme-less,
    // protocol-relative, opaque, userinfo, ports (good and bad), dup
    // slashes, trailing slash, fragments, tracking + real params, IDN hosts
    val hostGen = Gen.oneOf("WWW.Site7.CO.UK", "example.com", "bücher.de",
      "a.b.c.example.org", "[2001:db8::1]", "example.com.")
    val urlGen = for {
      scheme <- Gen.oneOf("https://", "http://", "HTTPS://", "", "//")
      user <- Gen.oneOf("", "alice:pw@")
      host <- hostGen
      port <- Gen.oneOf("", ":443", ":80", ":8443", ":8o80", ":")
      path <- Gen.oneOf("", "/", "/a//b/", "/p/q", "//x///y//")
      qs <- Gen.oneOf("", "?utm_source=f&z=2&a=1", "?b=2&a=1&fbclid",
        "?z=1&z=0&utm_campaign")
      frag <- Gen.oneOf("", "#sec", "#/settings?tab=1")
    } yield s"$scheme$user$host$port$path$qs$frag"
    val opaque = Gen.oneOf("mailto:a@b.com", "tel:+15551212", "data:text/plain,x")
    val gen = Gen.frequency(9 -> urlGen, 1 -> opaque)
    val urls = Iterator.continually(gen.sample).flatten.take(400).toSeq
    val df = urls.toDF("u")
      .select(col("u"), UrlOps.canonicalizeUrl(col("u")).as("c1"))
      .select(col("u"), col("c1"), UrlOps.canonicalizeUrl(col("c1")).as("c2"))
    val broken = df.filter(col("c1") =!= col("c2"))
      .select("u", "c1", "c2").collect()
    assert(broken.isEmpty, "canonicalization not idempotent:\n" +
      broken.take(5).map(r => s"  ${r.getString(0)} -> ${r.getString(1)} -> ${r.getString(2)}")
        .mkString("\n"))
  }

  test("minKProbMembership: hand-computed tail means; OOV floor; k-cut arithmetic") {
    import graft.operators.CorpusOps
    // reference LM: tokens {a:2, b:1} -> T=3, V=2; add-1 probs:
    // P(a)=3/5, P(b)=2/5, OOV=1/5
    val ref = Seq(Seq("a", "a", "b")).toDF("toks")
    val docs = Seq(
      ("d1", Seq("a", "b", "z", "a", "a")), // lps: 3*ln.6, ln.4, ln.2
      ("d2", Seq("a", "a")),                // lps: 2*ln.6
      ("d3", Seq.empty[String])             // token-less: absent
    ).toDF("id", "toks")
    def run(k: Double) = CorpusOps.minKProbMembership(ref, "toks",
        docs, "id", "toks", kFrac = k)
      .select("id", "n_tokens", "mink_logprob")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val g1 = run(0.2)
    // d1: ceil(0.2*5)=1 -> the single lowest lp = ln(1/5)
    assert(g1("d1")._1 == 5L)
    assert(math.abs(g1("d1")._2 - math.log(0.2)) < 1e-12)
    // d2: ceil(0.2*2)=1 -> ln(3/5)
    assert(math.abs(g1("d2")._2 - math.log(0.6)) < 1e-12)
    assert(!g1.contains("d3"), "token-less docs emit no row")
    // k=0.4 on d1: ceil(2)=2 -> mean(ln .2, ln .4)
    val g2 = run(0.4)
    assert(math.abs(g2("d1")._2 - (math.log(0.2) + math.log(0.4)) / 2) < 1e-12)
    // k=1 degenerates to the full-doc mean (= -unigram logppl of the ref LM)
    val g3 = run(1.0)
    val full = (3 * math.log(0.6) + math.log(0.4) + math.log(0.2)) / 5
    assert(math.abs(g3("d1")._2 - full) < 1e-12)
    // membership separation on the board shape: a doc OF the reference
    // scores higher (more member-like) than an all-OOV doc
    val sep = CorpusOps.minKProbMembership(ref, "toks",
        Seq(("m", Seq("a", "b", "a")), ("o", Seq("q", "r", "s")))
          .toDF("id", "toks"), "id", "toks", kFrac = 0.5)
      .select("id", "mink_logprob").as[(String, Double)].collect().toMap
    assert(sep("m") > sep("o"))
  }

  test("PCY equals A-priori on random baskets, any bucket count (no false negatives)") {
    // the PCY safety argument (a bucket's count bounds every resident
    // pair's support) must hold for ARBITRARY collision structure — tiny
    // bucket tables force heavy collisions, the adversarial regime the
    // md5-hashed board rows never visit
    import graft.operators.FrequentItemsets
    import org.scalacheck.Gen
    val basketsGen = Gen.listOfN(120, for {
      b <- Gen.chooseNum(0, 15)
      i <- Gen.chooseNum(0, 9)
    } yield (b.toLong, s"i$i"))
    var rounds = 0
    Iterator.continually(basketsGen.sample).flatten.take(6).foreach { rows =>
      val df = rows.toDF("basket", "item")
      for (nBuckets <- Seq(2, 7, 64); minSupport <- Seq(2L, 4L)) {
        val a = FrequentItemsets.frequentPairs(df, "basket", "item", minSupport)
          .collect().map(_.toSeq).toSet
        val p = FrequentItemsets.pcyFrequentPairs(df, "basket", "item",
            minSupport, nBuckets = nBuckets)
          .collect().map(_.toSeq).toSet
        assert(a == p, s"fi1 != fi2 at nBuckets=$nBuckets minSupport=$minSupport")
        rounds += 1
      }
    }
    assert(rounds == 36)
  }

  test("ksDrift: hand-computed integer cross-products, tie pin, identity zero") {
    import graft.operators.DataValidation
    def ks(a: Seq[Long], b: Seq[Long]) = DataValidation.ksDrift(
        a.toDF("v"), "v", b.toDF("v"), "v")
      .select("n_a", "n_b", "ks_ppm", "at_value")
      .as[(Long, Long, Long, Long)].head()
    // A=[1,1,2,5] B=[1,3,3]: diffs |cA*3 - cB*4| over v = (2,5,3,0);
    // max 5 at v=2; KS = 5/12 -> 416666 ppm floored
    assert(ks(Seq(1L, 1L, 2L, 5L), Seq(1L, 3L, 3L)) == (4L, 3L, 416666L, 2L))
    // identical samples: zero drift
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))._3 == 0L)
    // interleaved A=[1,3] B=[2,4]: max diff 2/4 attained at v=1 AND v=3 ->
    // smallest value pins the tie
    assert(ks(Seq(1L, 3L), Seq(2L, 4L)) == (2L, 2L, 500000L, 1L))
    // disjoint supports: KS = 1
    assert(ks(Seq(1L, 1L), Seq(9L, 9L))._3 == 1000000L)
    // empty side vs non-empty = TOTAL drift (the r15 review catch: the
    // cross-product form alone degenerates to 0 here)
    assert(ks(Seq(1L, 2L), Seq.empty) == (2L, 0L, 1000000L, 1L))
    assert(ks(Seq.empty, Seq(5L))._3 == 1000000L)
    // BOTH sides empty: the all-NULL row (r16 review regression guard —
    // null-skipping least/greatest must not turn NULL _dm into Long.MaxValue)
    val both = DataValidation.ksDrift(
        Seq.empty[Long].toDF("v"), "v", Seq.empty[Long].toDF("v"), "v").head()
    assert(both.isNullAt(0) && both.isNullAt(1) && both.isNullAt(2) && both.isNullAt(3),
      s"both-empty must be all-NULL, got $both")
    // fractional values survive (no silent long cast): scores in (0,1)
    // fully separated must read as total drift, not zero
    val fr = DataValidation.ksDrift(
        Seq(0.1, 0.12, 0.11).toDF("v"), "v",
        Seq(0.9, 0.92).toDF("v"), "v")
      .select("ks_ppm", "at_value").as[(Long, Double)].head()
    assert(fr._1 == 1000000L && fr._2 == 0.12, s"got $fr")
  }

  test("amsSelfJoinSize: exact on single-key input; estimate/error arithmetic") {
    import graft.operators.CorpusOps
    // one key: Z_i = ±f exactly, so every sketch gives f^2 -> est == exact
    val one = CorpusOps.amsSelfJoinSize(
        Seq.fill(7)("k").toDF("key"), "key", nSketches = 8)
      .select("n_sketches", "n_keys", "exact_f2", "est_f2", "err_ppm")
      .as[(Int, Long, Long, Long, Long)].head()
    assert(one == (8, 1L, 49L, 49L, 0L))
    // multi-key: exact F2 by hand (a:3, b:2, c:1 -> 9+4+1=14); the estimate
    // is md5-deterministic (same value on re-run) and the published error
    // is exactly |est-exact| ppm-floored
    val df = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("key")
    val g1 = CorpusOps.amsSelfJoinSize(df, "key", nSketches = 16)
      .select("n_keys", "exact_f2", "est_f2", "err_ppm")
      .as[(Long, Long, Long, Long)].head()
    val g2 = CorpusOps.amsSelfJoinSize(df, "key", nSketches = 16)
      .select("n_keys", "exact_f2", "est_f2", "err_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(g1 == g2, "md5-sign estimate must be deterministic")
    assert(g1._1 == 3L && g1._2 == 14L)
    assert(g1._4 == math.abs(g1._3 - 14L) * 1000000L / 14L)
  }
}
