package graft

import graft.functions.Norm
import org.apache.spark.sql.functions._

/** Pins the optimizer contract [[Norm.evalOnce]] / EvalBarrier exists for:
  * a multi-referenced expensive alias stays in its OWN projection (one
  * occurrence in the optimized plan) instead of being inlined into every
  * consumer by CollapseProject — while values are identical to the
  * unbarriered plan. The rag flagship leans on this in place of a
  * corpus-scale checkpoint, so the behavior is load-bearing.
  */
class EvalBarrierSpec extends SparkSpec {

  // parquet-backed (a local Seq would be ConvertToLocalRelation-folded,
  // evaluating the whole plan at optimize time and leaving nothing to pin)
  private lazy val docs = spark.read.parquet(sf("documents")).select("text")

  // mirrors the rag flagship's exact shape: repartition between the scan and
  // the tokenize (projections get pushed THROUGH Repartition), triplet
  // transform multi-referencing the alias, then the builder's explode
  private def tripled(toks: org.apache.spark.sql.Column) =
    docs.repartition(4)
      .select(toks.as("toks"))
      .select(
        when(size(col("toks")) < 3, array().cast("array<struct<a:string,b:string,c:string>>"))
          .otherwise(transform(sequence(lit(1), size(col("toks")) - 2, lit(3)),
            i => struct(
              element_at(col("toks"), i).as("a"),
              element_at(col("toks"), i + 1).as("b"),
              element_at(col("toks"), i + 2).as("c")))).as("t"))
      .select(explode(col("t")).as("x"))
      .select(col("x.a"), col("x.b"), col("x.c"))

  test("evalOnce keeps the alias un-inlined; values match the plain plan") {
    val plain = tripled(Norm.normTokens(col("text")))
    val barred = tripled(Norm.evalOnce(Norm.normTokens(col("text"))))

    // identical VALUES — compared as sorted multisets: the two plans
    // round-robin-repartition on different computed columns (the plain one
    // pushes the projection below the exchange), so row ORDER across them
    // is not part of the contract (r7 review)
    assert(barred.collect().map(_.toString).sorted.toSeq
      == plain.collect().map(_.toString).sorted.toSeq)

    // the barriered tokenize appears ONCE in the optimized plan...
    val barredPlan = barred.queryExecution.optimizedPlan.toString
    assert(barredPlan.split("evalbarrier", -1).length - 1 == 1,
      s"expected exactly one EvalBarrier occurrence:\n$barredPlan")
    assert(barredPlan.split("regexp_replace", -1).length - 1
      == plainTokenizeRegexCount, // one tokenize's worth of regexes, not per-reference copies
      s"barriered plan re-expanded the tokenize:\n$barredPlan")

    // ...while the plain plan inlines it into multiple consumers (the
    // pathology the barrier prevents; if Catalyst ever stops inlining,
    // this assert flags that the barrier may be retirable)
    val plainPlan = plain.queryExecution.optimizedPlan.toString
    assert(plainPlan.split("regexp_replace", -1).length - 1 > plainTokenizeRegexCount,
      s"CollapseProject no longer inlines multi-referenced expressions — " +
        s"re-evaluate whether EvalBarrier is still needed:\n$plainPlan")
  }

  test("evalOnce is projection-only: analyzer rejects it as a join key / group key") {
    // The barrier is nondeterministic by design; CheckAnalysis must refuse it
    // OUTSIDE Project/Filter/Aggregate rather than silently rewriting the
    // query. Pinning the rejection documents the public-API restriction
    // (Norm.evalOnce scaladoc) — if a Spark upgrade ever starts accepting
    // these, the restriction text needs a fresh audit, not silent trust.
    val other = docs.select(col("text").as("t2"))
    val je = intercept[org.apache.spark.sql.AnalysisException] {
      docs.join(other, Norm.evalOnce(col("text")) === col("t2")).collect()
    }
    assert(je.getMessage.contains("INVALID_NON_DETERMINISTIC_EXPRESSIONS"), je.getMessage)
    // a grouping key doesn't even reach CheckAnalysis cleanly — it trips
    // Spark's internal nondeterministic-grouping guard (SparkException,
    // INTERNAL_ERROR) after PullOutNondeterministic declines to rewrite it
    val ge = intercept[org.apache.spark.SparkException] {
      docs.groupBy(Norm.evalOnce(col("text"))).count().collect()
    }
    assert(ge.getMessage.contains("Non-deterministic"), ge.getMessage)
    // the sanctioned shape: alias in a projection, THEN group on the column
    val ok = docs.select(Norm.evalOnce(Norm.normPhrase(col("text"))).as("x"))
      .groupBy("x").count()
    assert(ok.count() > 0)
  }

  /** regexp_replace occurrences in ONE normTokens expansion. */
  private lazy val plainTokenizeRegexCount: Int = {
    val single = docs.select(Norm.normTokens(col("text")).as("toks"))
      .queryExecution.optimizedPlan.toString
    single.split("regexp_replace", -1).length - 1
  }
}
