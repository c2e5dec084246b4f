package graft

import graft.eval.Recall
import graft.operators.Dedup
import org.scalacheck.Gen

/** Randomized properties for the round-10 eval/dedup additions — invariants
  * that hold for ANY input, checked against brute force or algebra:
  * AUC is rank-only (monotone score transforms are no-ops), the bootstrap
  * interval is bracketed by the metric's range, pair quality is orientation-
  * invariant. These are the corners a fixed fixture never exercises. */
class EvalPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val scoredGen = Gen.listOfN(40, for {
    s <- Gen.chooseNum(0, 20) // coarse grid → plenty of score ties
    y <- Gen.oneOf(0, 1)
  } yield (s.toDouble / 20, y))

  test("aucRoc is invariant under strictly monotone score transforms") {
    Iterator.continually(scoredGen.sample).flatten.take(6).foreach { rows =>
      val df = rows.toDF("s", "y")
      def auc(d: org.apache.spark.sql.DataFrame) =
        Recall.aucRoc(d, "s", "y").select("auc").collect().head
      val base = auc(df)
      // x → x³ + 2x is strictly increasing: ranks unchanged ⇒ AUC unchanged
      val mono = auc(df.select((col("s") * col("s") * col("s") + col("s") * 2).as("s"),
        col("y")))
      assert(base == mono, s"rows=$rows")
      // reversing the score order flips AUC to 1 − AUC (both classes present)
      if (!base.isNullAt(0)) {
        val rev = auc(df.select((-col("s")).as("s"), col("y")))
        assert(math.abs(base.getDouble(0) + rev.getDouble(0) - 1.0) < 1e-12)
      }
    }
  }

  test("aucRoc equals the O(n²) pair count on arbitrary inputs") {
    Iterator.continually(scoredGen.sample).flatten.take(6).foreach { rows =>
      val r = Recall.aucRoc(rows.toDF("s", "y"), "s", "y").collect().head
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      if (pos.isEmpty || neg.isEmpty) assert(r.isNullAt(3))
      else {
        val want = (for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
        assert(math.abs(r.getDouble(3) - want) < 1e-12, s"rows=$rows")
      }
    }
  }

  test("bootstrapCi interval lies within [min, max] of the metric values") {
    val metricsGen = Gen.listOfN(25, Gen.chooseNum(0, 10).map(_ / 10.0))
    Iterator.continually(metricsGen.sample).flatten.take(4).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (f"q$i%03d", v) }
        .toDF("question_id", "v")
      val r = Recall.bootstrapCi(df, "question_id", "v", reps = 60).collect().head
      val (lo, mean, hi) = (r.getDouble(3), r.getDouble(2), r.getDouble(4))
      assert(lo <= mean && mean <= hi, s"vs=$vs")
      assert(lo >= vs.min - 1e-9 && hi <= vs.max + 1e-9, s"vs=$vs")
    }
  }

  test("d18 prefix-filtered Jaccard equals the full posting join on random corpora") {
    // random docs from a small vocabulary → dense near-dup structure, every
    // threshold regime hit; equality must be EXACT (same pairs, same scores)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docGen = Gen.listOfN(18, for {
      n <- Gen.chooseNum(4, 12)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    Iterator.continually(docGen.sample).flatten.take(5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (t <- Seq(0.3, 0.5, 0.8)) {
        val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
          .distinct().localCheckpoint(true)
        def canon(df: org.apache.spark.sql.DataFrame) = df
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
          .as[(Long, Long, Double)].collect().toSet
        val full = canon(Dedup.ngramJaccardPairsFromShingles(sh, t, 1000000L))
        val pref = canon(Dedup.prefixFilteredJaccardPairs(sh, t))
        assert(pref == full, s"t=$t texts=$texts")
      }
    }
  }

  test("d18 prefix filter survives the IEEE ceil round-up (t=0.28, sz=25)") {
    // 0.28·25 = 7.000000000000001 in IEEE doubles: a bare ceil reads 8 and
    // cuts the prefix one token short. Adversarial pair: x has 18 unique
    // tokens (df=1, sort FIRST under the rarest-first order) + 7 shared
    // (df=2, sort LAST — positions 19..25); y ⊆ x is exactly those 7.
    // J = 7/25 = 0.28 ≥ t, and the only shared token reachable by x's
    // prefix is position 19 — precisely the position the round-up lops off.
    val x = (1 to 18).map(i => (1L, f"u$i%02d")) ++ (1 to 7).map(i => (1L, s"s$i"))
    val y = (1 to 7).map(i => (2L, s"s$i"))
    val sh = (x ++ y).toDF("id", "sh")
    val got = Dedup.prefixFilteredJaccardPairs(sh, 0.28)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.28)), got)
  }

  test("conductance stays in [0,1] and both boundary counts balance on random graphs") {
    import graft.operators.LabelPropagation
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L); if a != b
    } yield (a, b))
    Iterator.continually(edgeGen.sample).flatten.take(4).foreach { und =>
      val dedup = und.map(p => (p._1 min p._2, p._1 max p._2)).distinct
      val edges = dedup.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
      val labels = (0L to 9L).map(i => (i, (i % 3).toString)).toDF("id", "label")
      val rows = LabelPropagation.conductance(labels, edges).collect()
      rows.foreach { r =>
        if (!r.isNullAt(4)) {
          val phi = r.getDouble(4)
          assert(phi >= 0.0 && phi <= 1.0, s"phi=$phi edges=$dedup")
        }
        assert(r.getLong(3) <= r.getLong(2)) // cut ⊆ volume
      }
      // every directed cut edge is counted once on each side: Σcut is even
      assert(rows.map(_.getLong(3)).sum % 2 == 0)
    }
  }

  test("weightedQuantiles is monotone in q and returns observed values") {
    import graft.operators.CorpusOps
    val rowsGen = Gen.listOfN(20, for {
      v <- Gen.chooseNum(1L, 50L); w <- Gen.chooseNum(1L, 9L)
    } yield (v, w))
    Iterator.continually(rowsGen.sample).flatten.take(4).foreach { rows =>
      val df = rows.toDF("v", "w")
      val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
      val got = CorpusOps.weightedQuantiles(df, "v", "w", qs)
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
      val ordered = qs.map(got)
      assert(ordered == ordered.sorted, s"rows=$rows got=$got")
      assert(ordered.forall(v => rows.exists(_._1 == v))) // observed values only
      assert(got(1.0) == rows.map(_._1).max) // full mass ⇒ the maximum
      // brute-force check of the q=0.5 cut
      val w = rows.map(_._2).sum
      val cum = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
        .scanLeft((0L, 0L)) { case ((_, c), (v, wv)) => (v, c + wv) }.drop(1)
      val want = cum.find(_._2 >= 0.5 * w).get._1
      assert(got(0.5) == want, s"rows=$rows")
    }
  }

  test("survivorship picks the brute-force modal value on random clusters") {
    import graft.operators.CorpusOps
    val recGen = Gen.listOfN(30, for {
      c <- Gen.chooseNum(0L, 3L); id <- Gen.chooseNum(0L, 1000L)
      v <- Gen.oneOf("x", "y", "z")
    } yield (c, id, v))
    Iterator.continually(recGen.sample).flatten.take(4).foreach { recs =>
      val df = recs.toDF("cluster", "rid", "attr1")
      val got = CorpusOps.survivorship(df, "cluster", "rid", Seq("attr1"))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      recs.groupBy(_._1).foreach { case (c, rs) =>
        val counts = rs.groupBy(_._3).view.mapValues(_.size).toMap
        val want = counts.toSeq.sortBy { case (v, n) => (-n, v) }.head._1
        assert(got(c) == want, s"cluster=$c counts=$counts")
      }
    }
  }

  test("trussPeel invariants on random graphs: cuts honest, k-monotone, degree bound") {
    import graft.operators.Triangles
    val edgeGen = Gen.listOfN(30, for {
      a <- Gen.chooseNum(0L, 11L); b <- Gen.chooseNum(0L, 11L); if a != b
    } yield (a, b))
    Iterator.continually(edgeGen.sample).flatten.take(4).foreach { und =>
      val edges = und.toDF("src", "dst")
      val out4 = Triangles.trussPeel(edges, "src", "dst", k = 4, rounds = 3)
        .as[(Long, Long, Int, Long)].collect()
      // every input edge appears exactly once (canonical form)
      val canon = und.map(p => (p._1 min p._2, p._1 max p._2)).distinct.toSet
      assert(out4.map(e => (e._1, e._2)).toSet == canon)
      assert(out4.length == canon.size)
      // every REMOVED edge was genuinely under-supported at removal time
      // (survivors carry their support on the final set, which can sit
      // below k−2 when fixed rounds stop before the fixpoint — that is
      // the documented fixed-round contract, not an error)
      out4.foreach { case (u, v, layer, sup) =>
        if (layer > 0) assert(sup < 2, s"removed ($u,$v) layer $layer sup $sup")
      }
      // stricter k peels strictly more: survivors(k=4) ⊆ survivors(k=3)
      val s4 = out4.filter(_._3 == 0).map(e => (e._1, e._2)).toSet
      val s3 = Triangles.trussPeel(edges, "src", "dst", k = 3, rounds = 3)
        .as[(Long, Long, Int, Long)].collect().filter(_._3 == 0)
        .map(e => (e._1, e._2)).toSet
      assert(s4.subsetOf(s3), s"edges=$und")
    }
  }

  test("pairQuality is invariant under pair orientation and duplication") {
    val pairsGen = Gen.listOfN(30, for {
      a <- Gen.chooseNum(0L, 12L); b <- Gen.chooseNum(0L, 12L); if a != b
    } yield (a, b))
    Iterator.continually((for { c <- pairsGen; t <- pairsGen } yield (c, t)).sample)
      .flatten.take(4).foreach { case (cand, truth) =>
        val c1 = cand.toDF("id_a", "id_b")
        // flip every pair and duplicate the list: same canonical set
        val c2 = cand.map(p => (p._2, p._1)).toDF("id_a", "id_b").unionAll(c1)
        val t1 = truth.toDF("id_a", "id_b")
        val r1 = Dedup.pairQuality(c1, t1).collect().head
        val r2 = Dedup.pairQuality(c2, t1).collect().head
        assert(r1 == r2, s"cand=$cand truth=$truth")
      }
  }
}
