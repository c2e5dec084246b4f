package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static lint over [[SparkEntry.oracleSql]] pinning the DuckDB HUGEINT trap:
  * `sum(BIGINT)` returns HUGEINT, which the driver's `fetchdf()` materializes
  * as float64, so an uncast integer sum in a FINAL projection value-hashes as
  * `928.0` against Spark's `928` (rows and schema still match — the round-5
  * `bp1_pair_counts` red row). Any naked `sum(` in a final projection must
  * either be wrapped `CAST(... AS BIGINT)` / `round(...)` or appear in the
  * reviewed allowlist below (sums whose operand is already DOUBLE-typed).
  */
class OracleSqlSpec extends AnyFunSuite {

  /** Query names with a reviewed, double-typed naked sum in their final
    * projection. Adding a new oracle with a naked final-projection sum fails
    * this spec until the sum is either cast or reviewed onto this list.
    */
  private val reviewedDoubleSums = Set(
    "b1_bm25_topk", // sum(ln(...) * ...) — DOUBLE operand
    "m1_recall"     // sum(CASE...)/5.0 — float division yields DOUBLE
  )

  /** The final top-level SELECT's projection segment (up to its FROM), found
    * by a paren-depth scan so CTE/subquery SELECTs are skipped.
    */
  private def finalProjection(sql: String): String = {
    // Quote-aware depth scan: a paren inside a SQL string literal (e.g. a
    // regexp '\(') must not shift the depth, and SELECT/FROM keywords inside
    // literals must not anchor the segmentation. Single quotes escape by
    // doubling ('') in SQL, which this state machine handles for free: the
    // second quote just reopens the literal for one character.
    var depth = 0
    var inQuote = false
    var lastSelect = -1
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case _ if inQuote => ()
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && sql.regionMatches(true, i, "SELECT", 0, 6)) lastSelect = i
      }
      i += 1
    }
    if (lastSelect < 0) return ""
    val tail = sql.substring(lastSelect)
    // cut at the first depth-0 FROM after the projection
    depth = 0
    inQuote = false
    i = 0
    while (i < tail.length) {
      tail.charAt(i) match {
        case '\'' => inQuote = !inQuote
        case _ if inQuote => ()
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && tail.regionMatches(true, i, " FROM ", 0, 6))
            return tail.substring(0, i)
      }
      i += 1
    }
    tail
  }

  /** Positions of `sum(` in `seg` that are standalone (not `list_sum(` etc.)
    * and not immediately wrapped by `CAST(` or `round(`.
    */
  private def nakedSums(seg: String): Seq[Int] = {
    val lower = seg.toLowerCase
    Iterator
      .iterate(lower.indexOf("sum("))(p => lower.indexOf("sum(", p + 1))
      .takeWhile(_ >= 0)
      .filter { p =>
        val standalone = p == 0 || { val c = lower.charAt(p - 1); !c.isLetterOrDigit && c != '_' }
        val wrapped = lower.lastIndexOf("cast(", p) == p - 5 || lower.lastIndexOf("round(", p) == p - 6
        standalone && !wrapped
      }
      .toSeq
  }

  test("no oracle has an uncast integer sum in its final projection") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val seg = finalProjection(sql)
      val naked = nakedSums(seg)
      if (naked.nonEmpty && !reviewedDoubleSums.contains(name))
        Some(s"$name: naked sum( in final projection — cast to BIGINT or review onto the " +
          s"allowlist. Segment: ${seg.take(200)}")
      else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("bp1's final sum is cast to BIGINT (the round-5 red row)") {
    assert(SparkEntry.oracleSql("bp1_pair_counts").contains("CAST(sum(freq) AS BIGINT)"))
  }

  test("bp2 oracle SQL uses double-delimiter symbol fences") {
    // single '|' separators make ADJACENT occurrences of a merge pair share a
    // delimiter char — the first replace match consumes it and the second
    // occurrence is skipped ('mining' → [m,in,i,n,g]); each symbol must own
    // both its fences
    val sql = SparkEntry.oracleSql("bp2_bpe_encode")
    assert(sql.contains("'|in|'") || sql.contains("||"), sql.take(200))
    assert(sql.contains("'|i||n|'"), "expected double-fence replace patterns\n" + sql.take(300))
  }

  test("bp2 merge list satisfies the one-pass-per-rank precondition") {
    // the oracle applies each rank ONCE in order; that equals the iterative
    // min-rank encoder only if every merge component is a base symbol (one
    // code point) or the output of a STRICTLY EARLIER merge — pin it so a
    // future merge-list edit can't silently break the equivalence argument
    val list = SparkEntry.bp2Merges
    val produced = scala.collection.mutable.Set.empty[String]
    list.foreach { case (a, b) =>
      Seq(a, b).foreach { c =>
        assert(c.codePointCount(0, c.length) == 1 || produced.contains(c),
          s"component '$c' of merge ($a,$b) is neither a base symbol nor an earlier output")
      }
      // outputs must be UNIQUE across ranks: if two ranks produced the same
      // string, a component claiming "earlier output" could actually need the
      // LATER rank at encode time, voiding the one-pass-per-rank argument
      assert(!produced.contains(a + b),
        s"merge output '${a + b}' is produced by two ranks — ambiguous precedence")
      produced += (a + b)
    }
  }
}
