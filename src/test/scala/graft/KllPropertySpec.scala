package graft

import graft.operators.QuantileSketch
import org.scalacheck.Gen

/** Randomized properties for the md5-derandomized KLL sketch — the claims
  * the operator's correctness rests on, exercised where random data finds
  * the corners (duplicate values, skewed splits, caps near/below n):
  *  1. merge == one-shot, bit-equal, for ARBITRARY partitions of the input
  *     (the mergeability theorem behind kllMaintain's stream exactness);
  *  2. estimates are genuine input values whose EXACT rank respects the
  *     sampling error bound (not just "close values" — rank semantics);
  *  3. cap is honored and the level is minimal (level-1 would overflow cap
  *     whenever level > 0). */
class KllPropertySpec extends SparkSpec {
  import spark.implicits._

  private val inputGen = for {
    n <- Gen.chooseNum(1, 900)
    // values from a SMALL domain so duplicates are common (the tie paths)
    vs <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
    cap <- Gen.oneOf(8, 32, 128, 1200) // 1200 > max n: the no-compaction path
    cut <- Gen.chooseNum(0, n) // arbitrary (incl. empty-side) split point
  } yield (vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, cap, cut)

  test("merge == one-shot bit-equal on arbitrary splits; cap and minimality hold") {
    Iterator.continually(inputGen.sample).flatten.take(8).foreach {
      case (rows, cap, cut) =>
        val df = rows.toDF("id", "v")
        val (a, b) = (rows.take(cut).toDF("id", "v"), rows.drop(cut).toDF("id", "v"))
        val oneShot = QuantileSketch.build(df, "v", "id", cap)
          .as[(Long, String, Long, Int, Int)].collect().toSet
        val merged = QuantileSketch.merge(
          QuantileSketch.build(a, "v", "id", cap),
          QuantileSketch.build(b, "v", "id", cap), cap)
          .as[(Long, String, Long, Int, Int)].collect().toSet
        assert(merged == oneShot, s"n=${rows.size} cap=$cap cut=$cut")
        assert(oneShot.size <= cap, s"cap violated: ${oneShot.size} > $cap")
        val level = oneShot.head._5
        if (level > 0) {
          // minimality: one level down must overflow cap (otherwise the
          // sketch threw away samples it was allowed to keep)
          val oneDown = QuantileSketch.leveled(df, "v", "id")
            .filter($"_tz" >= level - 1).count()
          assert(oneDown > cap, s"level $level not minimal (level-1 keeps $oneDown <= $cap)")
        }
    }
  }

  test("estimates are input values with rank inside the sampling bound") {
    Iterator.continually(inputGen.sample).flatten.take(6).foreach {
      case (rows, cap, _) =>
        val df = rows.toDF("id", "v")
        val n = rows.size
        val sorted = rows.map(_._2).sorted
        val qs = Seq(10, 50, 90)
        val est = QuantileSketch.quantiles(df, "v", "id", cap, qPcts = qs)
          .select("q_pct", "est", "m_kept").as[(Long, Long, Long)].collect()
        est.foreach { case (q, e, m) =>
          assert(sorted.contains(e), s"estimate $e is not an input value")
          // exact rank of e within 6 sampling standard deviations of q·n/100
          // (e's rank can sit anywhere in its duplicate run — take the
          // closest end of the run to the target)
          val lo = sorted.indexOf(e) + 1
          val hi = sorted.lastIndexOf(e) + 1
          val target = q * n / 100.0
          val dist = math.min(math.abs(lo - target), math.abs(hi - target))
          val tol = math.max(6.0 * n / math.sqrt(m.toDouble), 2.0)
          assert(dist <= tol, s"q=$q est=$e rank=[$lo,$hi] target=$target " +
            s"tol=$tol n=$n m=$m")
        }
    }
  }
}
