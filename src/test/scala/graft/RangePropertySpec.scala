package graft

import graft.operators.{CorpusOps, ProductQuantizer => PQ, RangeJoin}
import org.scalacheck.Gen

/** Randomized properties for the range-join family and PQ: brute-force
  * equivalence on arbitrary inputs — the failure modes (bin-boundary
  * off-by-ones, multi-bin double emission, float mis-binning) live exactly
  * in the corners random data finds. */
class RangePropertySpec extends SparkSpec {
  import spark.implicits._

  private val intervalsGen = Gen.listOfN(25, for {
    lo <- Gen.chooseNum(-100L, 100L)
    len <- Gen.chooseNum(0L, 40L) // includes empty intervals
  } yield (lo, lo + len))

  test("point-in-interval equals brute force on random data, any bin width") {
    val pointsGen = Gen.listOfN(60, Gen.chooseNum(-120L, 160L))
    Iterator.continually(
        (for { i <- intervalsGen; p <- pointsGen; w <- Gen.oneOf(1L, 3L, 7L, 50L) }
          yield (i, p, w)).sample)
      .flatten.take(8).foreach { case (intervals, points, w) =>
        val ivs = intervals.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
        val want = (for {
          p <- points; (i, lo, hi) <- ivs; if p >= lo && p < hi
        } yield (p, i)).groupBy(identity).view.mapValues(_.size).toMap
        val got = RangeJoin.pointInInterval(
            points.toDF("pt"), ivs.toDF("iid", "lo", "hi"), "pt", "lo", "hi", w)
          .select("pt", "iid").as[(Long, Int)].collect()
          .groupBy(identity).view.mapValues(_.size).toMap
        assert(got == want, s"binWidth=$w intervals=$ivs points=$points")
      }
  }

  test("interval overlap equals brute force on random data, exactly once") {
    Iterator.continually(
        (for { a <- intervalsGen; b <- intervalsGen; w <- Gen.oneOf(1L, 9L, 33L) }
          yield (a, b, w)).sample)
      .flatten.take(8).foreach { case (as, bs, w) =>
        val av = as.zipWithIndex.map { case ((lo, hi), i) => (i, lo, hi) }
        val bv = bs.zipWithIndex.map { case ((lo, hi), i) => (i + 1000, lo, hi) }
        val want = (for {
          (ai, al, ah) <- av; (bi, bl, bh) <- bv
          if al < bh && bl < ah && al < ah && bl < bh
        } yield (ai, bi)).toSet
        val got = RangeJoin.intervalOverlap(
            av.toDF("aid", "alo", "ahi"), "alo", "ahi",
            bv.toDF("bid", "blo", "bhi"), "blo", "bhi", w)
          .select("aid", "bid").as[(Int, Int)].collect()
        assert(got.length == got.distinct.length, s"dupes at w=$w")
        assert(got.toSet == want, s"w=$w a=$av b=$bv")
      }
  }

  test("pq codes: round-trip distortion beats or ties the worst codeword everywhere") {
    // random vectors; every vector's chosen codeword must be its argmin —
    // cross-check the declarative assignment against a driver-side argmin
    val rows = (0 until 25).map { i =>
      (i, (0 until 8).map(d => math.cos(i * 17 + d * 3).toFloat))
    }
    val corpus = rows.toDF("id", "v")
    val cb = PQ.train(corpus, "id", "v", m = 2, dsub = 4, k = 6)
    val cw = cb.codewords.select("sub", "code", "cvec")
      .as[(Int, Int, Seq[Float])].collect()
      .groupBy(_._1).view.mapValues(_.map(c => c._2 -> c._3).toMap).toMap
    val codes = PQ.encode(corpus, "id", "v", cb)
      .as[(String, Int, Int)].collect()
    def d2(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    codes.foreach { case (id, sub, code) =>
      val v = rows(id.toInt)._2.slice(sub * 4, sub * 4 + 4)
      val chosen = d2(v, cw(sub)(code))
      cw(sub).foreach { case (c2, cv) =>
        assert(chosen <= d2(v, cv) + 1e-9, s"id=$id sub=$sub chose $code over $c2")
      }
    }
  }

  test("weighted sample keys are a valid permutation driver (all distinct, stable)") {
    val df = (1 to 300).map(i => (s"doc$i", (i % 7 + 1).toDouble)).toDF("id", "w")
    val keys = df.select(CorpusOps.weightedSampleKey(
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("w")))
      .as[Double].collect()
    assert(keys.distinct.length == keys.length) // md5 keys don't collide here
    assert(keys.forall(k => k < 0.0 && !k.isNaN && !k.isInfinite))
  }
}
