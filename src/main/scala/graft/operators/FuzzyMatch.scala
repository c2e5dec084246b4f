package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Typo-tolerant dictionary matching: each probe string finds its top-k
  * nearest entity names by edit distance. The graph build dedups entities by
  * EXACT normalized name (SURVEY §2.4 G2, builder.py:76-85) and query-time
  * NER output is matched the same way — one character of OCR noise or a
  * transliteration variant silently severs the query from the graph. This
  * operator is the robustness layer: "Albret Einstein" still finds its node.
  *
  * Scale shape: the probe side (NER output, a review queue, a blocklist) is
  * broadcast-small by contract; the entity table is the big side and is
  * scanned ONCE with everything fused into codegen — a length pre-filter
  * (|len(c)−len(p)| ≤ maxDist, a necessary condition for edit distance)
  * prunes before the O(len²) Levenshtein, which itself runs in Spark's
  * threshold form (early-abandon beyond maxDist). Then the bounded
  * [[TopKAggregator]] per probe. No windows over data, no all-pairs product
  * — cost is O(corpus × probes) cheap compares, the same contract as every
  * other query-side operator here.
  *
  * For corpus×corpus fuzzy DEDUP (both sides large) use the blocked
  * similarity family instead ([[Dedup.lshCandidatePairs]], n-gram Jaccard,
  * SimHash): edit-distance all-pairs does not scale and is deliberately not
  * offered.
  */
object FuzzyMatch {

  /** Top-k candidates per probe by (edit distance ASC, candidate ASC), at
    * most `maxDist` edits. Probes with no candidate within range emit no
    * rows. Output: (probe_id, rank, match, dist). */
  def topKByEditDistance(corpus: DataFrame, cId: String, cStr: String,
      probes: DataFrame, pId: String, pStr: String,
      maxDist: Int, k: Int): DataFrame = {
    require(maxDist >= 0 && k > 0)
    val topk = VectorSearch.topKUdaf(k)
    corpus
      .select(col(cId).cast("string").as("match"), col(cStr).as("_cs"))
      .crossJoin(broadcast(probes.select(
        col(pId).cast("string").as("probe_id"), col(pStr).as("_ps"))))
      .filter(abs(length(col("_cs")) - length(col("_ps"))) <= maxDist)
      // threshold Levenshtein: abandons rows beyond maxDist (returns -1)
      .withColumn("_d", levenshtein(col("_cs"), col("_ps"), maxDist))
      .filter(col("_d") >= 0)
      .groupBy("probe_id")
      .agg(topk(col("match"), -col("_d").cast("double")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("match"), (-col("col.score")).cast("int").as("dist"))
  }
}
