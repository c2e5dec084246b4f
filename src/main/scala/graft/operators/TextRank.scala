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
  * Scale shape: one tokenize+posexplode pass, one self-join on
  * (doc, pos+1) for the window-2 edges (equi-join, never a pair scan),
  * then `iterations` rounds of join+group — every aggregation is keyed by
  * (doc, word), so the whole computation is embarrassingly parallel across
  * documents and a 100 TB corpus just means more (doc, word) groups. The
  * final top-k is a doc-partitioned window over ≤ vocabulary-sized groups,
  * never a global sort.
  *
  * Determinism (the cross-engine contract): score update
  * `(1−d) + d·Σ tr(u)/deg(u)` folds its float sum in (neighbor ASC) order
  * on both engines (sort_array struct fold ↔ DuckDB `sum(x ORDER BY u)` —
  * the g29/x36 convention) and `1−d` is computed as the same double
  * subtraction both sides, so the score doubles are BIT-IDENTICAL — the
  * ranking therefore orders by the RAW score (word tiebreak), never a
  * rounded one. TextRank scores are small terminating rationals that land
  * exactly on .5 rounding boundaries (doc-236 measured 1.0371875), where
  * Spark's string-based HALF_UP and DuckDB's double-based round disagree;
  * the oracle-safe projection is `floor(score·1e6)` — pure double-domain
  * arithmetic on identical bits. Words with no neighbor (single-token
  * documents) have no graph node and drop out.
  *
  * Output: (id, rank, keyword, score), top `topK` words per document by
  * (score DESC, word ASC); `score` is the raw double.
  */
object TextRank {

  def keywords(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 5, iterations: Int = 2, damping: Double = 0.85): DataFrame = {
    require(topK >= 1, s"keywords: topK must be >= 1, got $topK")
    require(iterations >= 1, s"keywords: iterations must be >= 1, got $iterations")
    // the id is carried as string through the joins (one canonical grouping
    // key type) but the OUTPUT projection restores the caller's dtype — a
    // BIGINT doc_id in must be a BIGINT doc_id out
    val idType = docs.schema(idCol).dataType
    // Window-2 edges built AT THE ARRAY LEVEL (r18, guide §2.4): adjacent
    // token pairs are generated inside one projection over the tokenized
    // document. The previous posexplode self-join shuffled the entire token
    // stream TWICE (one hash exchange per join side on (doc, pos)) and
    // tokenized the corpus twice, just to pair each token with its
    // successor — a successor that already sits next to it in the token
    // array. The pair set is IDENTICAL: transform i∈[1, n−1] emits
    // (ts[i], ts[i+1]), exactly the old (a.doc = b.doc AND a.pos+1 = b.pos)
    // join, and the u≠v filter is the old join's third conjunct; the
    // downstream union+distinct is untouched, so the edge set — and every
    // score bit after it — is unchanged (oracle-verified). EvalBarrier on
    // the token array: CollapseProject would otherwise inline normTokens
    // into every element_at of the lambda (the rag_pipeline lesson — one
    // regexp+split per TOKEN instead of per document). The when-guard keeps
    // sequence() off the size<2 case (sequence(1,0) counts DOWN, the
    // Norm.shingles convention).
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
    // symmetric, distinct — the undirected co-occurrence graph; pinned once,
    // read by deg + every iteration's contribution join
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
