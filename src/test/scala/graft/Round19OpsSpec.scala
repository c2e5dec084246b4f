package graft

import org.apache.spark.sql.functions._

/** Round-19 optimization pins: every behavior-preserving rewrite this round
  * gets its equality asserted here against the retained reference form. */
class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  private def textrankRows(df: org.apache.spark.sql.DataFrame) = df
    .collect()
    .map(r => (r.get(0).toString, r.getInt(1), r.getString(2),
      java.lang.Double.doubleToRawLongBits(r.getDouble(3))))
    .sortBy(t => (t._1, t._2))
    .toSeq

  test("TextRank array form == join form, bit-identical, on the corpus") {
    import graft.operators.TextRank
    val docs = spark.read.parquet(sf("documents"))
    val a = textrankRows(
      TextRank.keywords(docs, "doc_id", "text", topK = 5, iterations = 2))
    val b = textrankRows(
      TextRank.keywordsJoin(docs, "doc_id", "text", topK = 5, iterations = 2))
    assert(a.nonEmpty && a == b)
  }

  test("KLL build fast path == lazy two-pass form, survivors and level") {
    import graft.operators.QuantileSketch
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 6) {
      val n = Seq(1, 7, 63, 300, 2000, 9000)(trial - 1)
      val cap = Seq(1, 4, 16, 64, 256, 64)(trial - 1)
      val df = (1 to n).map(i => (rnd.nextInt(500).toLong, s"id$i"))
        .toDF("v", "id")
      def rows(sk: org.apache.spark.sql.DataFrame) = sk
        .select("_v", "_id", "_h", "_tz", "_level").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
          r.getInt(4))).sortBy(t => (t._1, t._2)).toSeq
      val fast = rows(QuantileSketch.build(df, "v", "id", cap))
      // the reference: the generic grouped path on a constant group
      val slow = rows(QuantileSketch.buildByGroup(
        df.withColumn("_g19", lit(1)), Seq("_g19"), "v", "id", cap)
        .drop("_g19"))
      assert(fast == slow, s"trial $trial: n=$n cap=$cap")
    }
    // empty input: empty sketch, right schema
    val empty = QuantileSketch.build(
      Seq.empty[(Long, String)].toDF("v", "id"), "v", "id", 8)
    assert(empty.count() == 0 && empty.columns.contains("_level"))
  }

  test("d18 big regime (dictionary codes + shuffle-hash verify) == default regime") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(sf("documents"))
    val docSh = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .distinct().localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.get(0).toString, r.get(1).toString,
        java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
      .sortBy(t => (t._1, t._2)).toSeq
    for (t <- Seq(0.28, 0.5, 0.8)) {
      val big = rows(Dedup.prefixFilteredJaccardPairs(docSh, t, bigBytes = 0L))
      val dft = rows(Dedup.prefixFilteredJaccardPairs(docSh, t))
      assert(big == dft, s"threshold $t")
      if (t == 0.28) assert(big.nonEmpty)
    }
  }

  test("TextRank array form == join form on adversarial docs") {
    import graft.operators.TextRank
    val docs = Seq(
      ("d1", "a b a c"),                        // tie-break on equal scores
      ("d2", "solo"),                           // single token: no node
      ("d3", ""),                               // empty
      ("d4", "x x x x"),                        // all self-pairs filtered
      ("d5", "a a b b a c a"),                  // repeated adjacents
      ("d6", "Q9 q9 Q9! q8? q7 q9"),            // normalization collisions
      ("d7", (1 to 40).map(i => s"w${i % 7}").mkString(" ")), // dense cycle
      ("d8", "z y x w v u t s r q p o n m l k j i h g f e d c b a"),
      ("d9", "a b c a b c a b c d e")
    ).toDF("id", "text")
    val a = textrankRows(
      TextRank.keywords(docs, "id", "text", topK = 3, iterations = 3))
    val b = textrankRows(
      TextRank.keywordsJoin(docs, "id", "text", topK = 3, iterations = 3))
    assert(a.nonEmpty && a == b)
  }
}
