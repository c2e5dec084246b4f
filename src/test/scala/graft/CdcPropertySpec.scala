package graft

import graft.operators.{CorpusOps, CountingBloom}
import org.scalacheck.Gen

/** Randomized properties for the CDC pair at the heart of incremental
  * maintenance: snapshotDiff (the read) and the counting-Bloom maintain
  * path it drives (the write). Random edit scripts find the corners the
  * hand fixtures can't: adds colliding with removes, no-op edits, empty
  * versions, every-row-changed versions. */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  private val editGen = for {
    n <- Gen.chooseNum(0, 120)
    base <- Gen.listOfN(n, Gen.chooseNum(0L, 200L)) // duplicate-free below
    removeFrac <- Gen.chooseNum(0, 100)
    changeFrac <- Gen.chooseNum(0, 100)
    addN <- Gen.chooseNum(0, 60)
  } yield {
    val v1 = base.distinct.map(i => (i, s"text-$i", s"src${i % 3}"))
    val removed = v1.filter(_._1 % 101 < removeFrac).map(_._1).toSet
    val changed = v1.filter(r => !removed.contains(r._1) && r._1 % 97 < changeFrac)
      .map(_._1).toSet
    val v2 = v1.filterNot(r => removed.contains(r._1))
      .map(r => if (changed.contains(r._1)) (r._1, r._2 + "!", r._3) else r) ++
      (1000L until 1000L + addN).map(i => (i, s"new-$i", "srcX"))
    (v1, v2, removed, changed, addN)
  }

  test("snapshotDiff == brute-force diff on random edit scripts") {
    Iterator.continually(editGen.sample).flatten.take(8).foreach {
      case (v1, v2, removed, changed, addN) =>
        val got = CorpusOps.snapshotDiff(
            v1.toDF("doc_id", "text", "source"),
            v2.toDF("doc_id", "text", "source"), "doc_id", Seq("text", "source"))
          .as[(Long, String)].collect().toSet
        val want = removed.map(_ -> "removed") ++ changed.map(_ -> "changed") ++
          (1000L until 1000L + addN).map(_ -> "added").toSet
        assert(got == want,
          s"v1=${v1.size} v2=${v2.size} rm=${removed.size} ch=${changed.size} add=$addN")
    }
  }

  test("CountingBloom: maintain over a random disciplined edit script == rebuild") {
    Iterator.continually(editGen.sample).flatten.take(6).foreach {
      case (v1, v2, _, _, _) =>
        val m = 1 << 10
        val k1 = v1.map(_._1)
        val k2 = v2.map(_._1)
        // the snapshot delta, as the board row derives it
        val added = k2.diff(k1)
        val removed = k1.diff(k2)
        val maintained = CountingBloom.maintain(
            CountingBloom.counters(k1.toDF("k"), "k", m),
            // mIfEmpty pins m for the empty-v1 corner (marker-less state)
            added.toDF("k"), removed.toDF("k"), "k", mIfEmpty = m)
          .select("pos", "cnt").as[(Int, Long)].collect().toMap
        val rebuilt = CountingBloom.counters(k2.toDF("k"), "k", m)
          .select("pos", "cnt").as[(Int, Long)].collect().toMap
        assert(maintained == rebuilt, s"|v1|=${k1.size} |v2|=${k2.size} " +
          s"+${added.size} -${removed.size}")
        // empty-v2 corner: the state must collapse to NO counter rows
        if (k2.isEmpty) assert(maintained.isEmpty)
    }
  }
}
