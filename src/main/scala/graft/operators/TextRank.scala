package graft.operators

import graft.functions.Norm
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) — the
  * unsupervised per-document keyword read a curation pipeline uses for
  * topic tagging, index terms, and dedup-cluster labeling: build the
  * word co-occurrence graph of each document (adjacent normalized tokens,
  * window 2), run PageRank on it, and the top-scoring words are the
  * document's keywords. Purely deterministic — no model, no vocabulary —
  * so it runs identically on both engines and at any scale.
  *
  * Scale shape (r19): the ENTIRE computation is per-document — the
  * co-occurrence graph never crosses documents — so [[keywords]] runs it
  * at the ARRAY level inside one projection chain: tokenize once, build
  * the deduplicated symmetric edge list, derive degrees and sorted
  * in-neighbor lists, run the fixed iteration count, and select top-k, all
  * as higher-order functions over per-row arrays. ZERO exchanges after the
  * scan (guide §2.4 taken to its limit: a shuffle whose key is the row it
  * started from is no shuffle at all), no checkpoint, one job —
  * embarrassingly parallel across documents, so cores scale it linearly
  * and a 100 TB corpus is just more rows. Per-row cost is
  * O(V·E + iterations·E·V) in the document's OWN vocabulary/edge counts
  * (map lookups on Spark's array-backed maps are linear) — bounded by
  * per-document length, the same contract every per-doc text operator here
  * carries; the join-based form ([[keywordsJoin]], kept as the equality
  * reference) redistributes giant documents but pays 6 corpus-wide
  * exchanges to do it.
  *
  * Determinism (the cross-engine contract): score update
  * `(1−d) + d·Σ tr(u)/deg(u)` folds its float sum in (neighbor ASC) order
  * on both engines (sorted in-neighbor array fold ↔ DuckDB
  * `sum(x ORDER BY u)` — the g29/x36 convention) and `1−d` is computed as
  * the same double subtraction both sides, so the score doubles are
  * BIT-IDENTICAL — the ranking therefore orders by the RAW score (word
  * tiebreak), never a rounded one. TextRank scores are small terminating
  * rationals that land exactly on .5 rounding boundaries (doc-236 measured
  * 1.0371875), where Spark's string-based HALF_UP and DuckDB's
  * double-based round disagree; the oracle-safe projection is
  * `floor(score·1e6)` — pure double-domain arithmetic on identical bits.
  * Words with no neighbor (single-token documents) have no graph node and
  * drop out.
  *
  * Output: (id, rank, keyword, score), top `topK` words per document by
  * (score DESC, word ASC); `score` is the raw double.
  */
object TextRank {

  def keywords(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 5, iterations: Int = 2, damping: Double = 0.85): DataFrame = {
    require(topK >= 1, s"keywords: topK must be >= 1, got $topK")
    require(iterations >= 1, s"keywords: iterations must be >= 1, got $iterations")
    // the id is carried as string through the chain (one canonical key
    // type) but the OUTPUT projection restores the caller's dtype — a
    // BIGINT doc_id in must be a BIGINT doc_id out
    val idType = docs.schema(idCol).dataType
    // Every intermediate below is its own evalOnce-protected projection:
    // CollapseProject would otherwise inline each array into every lambda
    // that references it (the rag_pipeline lesson — one tokenization per
    // TOKEN instead of per document); the barriers pin one evaluation per
    // row per column while whole-stage codegen still fuses the chain.
    // The when-guard keeps sequence() off the size<2 case (sequence(1,0)
    // counts DOWN, the Norm.shingles convention).
    val base = docs.select(col(idCol).cast("string").as("doc"),
      Norm.evalOnce(Norm.normTokens(col(textCol))).as("ts"))
    // deduplicated symmetric window-2 edge list, per document: the r18
    // adjacent-pair transform (== the old (a.doc = b.doc AND a.pos+1 =
    // b.pos) self-join, u≠v kept as its third conjunct), both directions
    // emitted from each surviving pair (the PageRank.cooccurrenceEdges
    // generator move — the old self-union evaluated the tokenize subtree
    // twice), array_distinct == the old corpus-wide .distinct() per doc.
    val withEdges = base.select(col("doc"),
      Norm.evalOnce(array_distinct(flatten(transform(
        filter(when(size(col("ts")) < 2,
            array().cast("array<struct<u:string,v:string>>"))
          .otherwise(transform(sequence(lit(1), size(col("ts")) - 1),
            i => struct(element_at(col("ts"), i).as("u"),
              element_at(col("ts"), i + 1).as("v")))),
          p => p.getField("u") =!= p.getField("v")),
        p => array(p, struct(p.getField("v").as("u"),
          p.getField("u").as("v"))))))).as("es"))
    // node set (sorted — the canonical per-doc word order), out-degrees,
    // and per-word SORTED in-neighbor lists. deg(u) ≥ 1 for every word by
    // construction (symmetric edges), and within a word's in-neighbor list
    // each u appears once (es is distinct), so the ASC sort reproduces the
    // old sort_array(collect_list(struct(u, x))) fold order exactly.
    val withWords = withEdges.select(col("doc"), col("es"),
      Norm.evalOnce(array_sort(array_distinct(
        transform(col("es"), e => e.getField("u"))))).as("ws"))
    val withStatic = withWords.select(col("doc"), col("ws"),
      Norm.evalOnce(transform(col("ws"),
        w => size(filter(col("es"), e => e.getField("u") === w)))).as("degs"),
      Norm.evalOnce(transform(col("ws"),
        w => array_sort(transform(filter(col("es"), e => e.getField("v") === w),
          e => e.getField("u"))))).as("adjs"))
    var cur = withStatic.select(col("doc"), col("ws"), col("adjs"),
      Norm.evalOnce(map_from_arrays(col("ws"), col("degs"))).as("degM"),
      Norm.evalOnce(transform(col("ws"), _ => lit(1.0))).as("tr"))
    for (_ <- 1 to iterations) {
      // two projections per iteration: the rank map is its own barrier
      // column so each lambda lookup reads a value, not a map build
      val withMap = cur.select(col("doc"), col("ws"), col("adjs"), col("degM"),
        Norm.evalOnce(map_from_arrays(col("ws"), col("tr"))).as("trM"))
      cur = withMap.select(col("doc"), col("ws"), col("adjs"), col("degM"),
        Norm.evalOnce(transform(col("adjs"), ns =>
          lit(1.0 - damping) + lit(damping) * aggregate(ns, lit(0.0),
            (acc, u) => acc +
              element_at(col("trM"), u) / element_at(col("degM"), u))))
          .as("tr"))
    }
    // top-k inside the row: sort (score DESC, word ASC) — both engines
    // compare the identical raw doubles — and slice. arrays_zip on direct
    // attribute references names the fields after the columns.
    val top = cur.select(col("doc"),
      Norm.evalOnce(slice(array_sort(arrays_zip(col("ws"), col("tr")),
        (l, r) => when(l.getField("tr") > r.getField("tr"), -1)
          .when(l.getField("tr") < r.getField("tr"), 1)
          .when(l.getField("ws") < r.getField("ws"), -1)
          .when(l.getField("ws") > r.getField("ws"), 1)
          .otherwise(0)),
        1, topK)).as("top"))
    top.select(col("doc"), posexplode(col("top")))
      .select(col("doc").cast(idType).as(idCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.ws").as("keyword"), col("col.tr").as("score"))
  }

  /** The original join-based form — the same answer through corpus-wide
    * exchanges (edge distinct, degree aggregate, one join + one aggregation
    * per iteration, final window). Kept package-private as the equality
    * reference for [[keywords]] (the d8/d9 two-algorithms-one-oracle
    * pattern): TextRankSpec asserts bit-identical scores between the two
    * on real and adversarial corpora. Prefer [[keywords]]; this form's one
    * remaining advantage is redistributing pathologically large single
    * documents across tasks. */
  private[graft] def keywordsJoin(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 5, iterations: Int = 2, damping: Double = 0.85): DataFrame = {
    require(topK >= 1, s"keywords: topK must be >= 1, got $topK")
    require(iterations >= 1, s"keywords: iterations must be >= 1, got $iterations")
    val idType = docs.schema(idCol).dataType
    val half = docs
      .select(col(idCol).cast("string").as("doc"),
        Norm.evalOnce(Norm.normTokens(col(textCol))).as("ts"))
      .select(col("doc"), explode(when(size(col("ts")) < 2,
          array().cast("array<struct<u:string,v:string>>"))
        .otherwise(transform(sequence(lit(1), size(col("ts")) - 1),
          i => struct(element_at(col("ts"), i).as("u"),
            element_at(col("ts"), i + 1).as("v"))))).as("p"))
      .filter(col("p.u") =!= col("p.v"))
      .select(col("doc"), col("p.u").as("u"), col("p.v").as("v"))
    val edges = half
      .union(half.select(col("doc"), col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(true)
    val deg = edges.groupBy("doc", "u").agg(count(lit(1)).as("deg"))
    val degE = edges.join(deg, Seq("doc", "u")) // (doc, u, v, deg(u))
    var ranks = deg.select(col("doc"), col("u").as("w"), lit(1.0).as("tr"))
    for (_ <- 1 to iterations) {
      ranks = degE
        .join(ranks.withColumnRenamed("w", "u"), Seq("doc", "u"))
        .select(col("doc"), col("v").as("w"), col("u"),
          (col("tr") / col("deg")).as("x"))
        .groupBy("doc", "w")
        .agg(sort_array(collect_list(struct(col("u"), col("x")))).as("__l"))
        .select(col("doc"), col("w"),
          (lit(1.0 - damping) + lit(damping) *
            aggregate(transform(col("__l"), t => t.getField("x")),
              lit(0.0), (acc, x) => acc + x)).as("tr"))
    }
    val byDoc = Window.partitionBy(col("doc"))
      .orderBy(col("tr").desc, col("w").asc)
    ranks.withColumn("rank", row_number().over(byDoc))
      .filter(col("rank") <= topK)
      .select(col("doc").cast(idType).as(idCol), col("rank").cast("int").as("rank"),
        col("w").as("keyword"), col("tr").as("score"))
  }
}
