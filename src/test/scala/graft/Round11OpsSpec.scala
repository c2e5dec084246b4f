package graft

import graft.eval.Recall
import org.apache.spark.sql.functions._

/** Unit semantics for the round-11 additions (the Round10OpsSpec pattern):
  * hand-checked small cases per operator, independent of the DuckDB gate. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("m10 calibrationBins: perfect calibration flattens, clamping catches edges") {
    // scores 0.05/0.15/.../0.95, label = deterministic per construction:
    // bin b holds 10 rows of score b/10 + 0.05 with exactly b positives —
    // pos_rate = b/10, avg_score = b/10 + 0.05, so |gap| = 0.05 everywhere
    val rows = for {
      b <- 0 until 10; i <- 0 until 10
    } yield (b / 10.0 + 0.05, if (i < b) 1 else 0)
    val got = Recall.calibrationBins(rows.toDF("s", "y"), "s", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == (0L to 9L).toSet)
    (0 until 10).foreach { b =>
      val (n, np, avg, rate) = got(b.toLong)
      assert(n == 10L && np == b.toLong, s"bin $b")
      assert(math.abs(avg - (b / 10.0 + 0.05)) < 1e-9)
      assert(math.abs(rate - b / 10.0) < 1e-12)
    }
    // edge clamping: 1.0 joins the top bin, negative scores the bottom one
    val edge = Seq((1.0, 1), (1.0, 1), (-0.2, 0)).toDF("s", "y")
    val e = Recall.calibrationBins(edge, "s", "y", bins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e == Map(9L -> 2L, 0L -> 1L), e)
  }
}
