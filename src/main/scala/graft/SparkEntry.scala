package graft

import graft.functions.{Norm, VectorFunctions => VF}
import graft.operators.VectorSearch
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2 (or a scale-pipeline
  * operator) expressed over the driver's TPC-H-ish testdata; [[oracleSql]] holds the
  * equivalent DuckDB SQL the driver hash-compares against at sf0.01.
  *
  * Conventions for oracle parity:
  *  - every computed column aliased identically on both sides;
  *  - floats either avoided, produced by identical sequential double arithmetic
  *    (DotProduct ≡ list_dot_product on DOUBLE[]), or rounded;
  *  - ties in any top-k broken by id ascending on both sides.
  */
object SparkEntry {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("r1_knn_topk")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------------- §2.1 sources
    // S10 row-count stats (milvus.py:980-1014)
    "s10_stats" -> ((s, dir) => {
      Tables.names.map { n =>
        t(s, dir, n).select(lit(n).as("table_name"), lit(1).as("one"))
          .groupBy("table_name").agg(count(lit(1)).as("n_rows"))
      }.reduce(_ unionByName _)
    }),
    // S7 upsert: merge updated rows over base, preserving untouched rows
    // (milvus.py:511-713). Updates = customers with custkey%10==0 get acctbal+100.
    "s7_upsert" -> ((s, dir) => {
      val base = t(s, dir, "customer")
      val updates = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", round(col("c_acctbal") + 100.0, 2))
      base.join(updates.select("c_custkey"), Seq("c_custkey"), "left_anti")
        .unionByName(updates)
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
    }),
    // S8 batch delete as anti-join (milvus.py:717-843): victims = custkey%7==3.
    "s8_delete" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val victims = cust.filter(col("c_custkey") % 7 === 3).select("c_custkey")
      cust.join(victims, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // ------------------------------------------------------------- §2.2 text prep
    // T2 processing_phrases (llm/extractor.py:17-28)
    "t2_normalize" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Norm.normPhrase(col("text")).as("norm_text"))
    }),
    // T3 relation-text construction (graph/builder.py:99-103)
    "t3_relation_text" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          Norm.relationText(col("p_brand"), col("p_type"), col("p_name")).as("relation_text"))
    }),
    // T5 title extraction (evaluation/evaluate.py:219-229)
    "t5_title" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Norm.titleOf(col("text")).as("title"))
    }),

    // -------------------------------------------------------- §2.4 graph building
    // G1 triplet/word explode with position (graph/builder.py:150-157)
    "g1_explode" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(Norm.normTokens(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"), col("col").as("word"))
    }),
    // G2 entity dedup + deterministic id (graph/builder.py:76-85): distinct
    // normalized token -> md5 id.
    "g2_entity_dedup" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(Norm.normTokens(col("text"))).as("name"))
        .distinct()
        .select(Norm.idOf(col("name")).as("id"), col("name"))
    }),
    // G4/G5 adjacency build (graph/builder.py:86-122): word -> sorted distinct doc ids.
    "g4_adjacency" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(Norm.normTokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(sort_array(collect_set(col("doc_id"))).as("doc_ids"),
          countDistinct(col("doc_id")).as("n_docs"))
    }),
    // G9 cascade delete: strip a victim id out of adjacency arrays
    // (graph/graph.py:237-282; array filter semantics).
    "g9_cascade" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(Norm.normTokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(sort_array(collect_set(col("doc_id"))).as("doc_ids"))
        .select(col("word"),
          filter(col("doc_ids"), d => d =!= 0L).as("doc_ids_after"))
    }),

    // ----------------------------------------------------------- §2.5 embeddings
    // E3 L2 normalization (embeddings.py:142-143), rounded for float stability.
    "e3_l2_normalize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(VF.l2Normalize(col("embedding")), x => round(x, 6)).as("unit_vec"))
    }),

    // ------------------------------------------------------------ §2.6 retrieval
    // R1 KNN top-k (retriever.py:101-132 / milvus.py:346-373): queries = vec_id<8,
    // corpus = the rest; exact top-5 by dot product, ties by id.
    "r1_knn_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      VectorSearch.knnJoin(
        emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") >= 8),
        "vec_id", "embedding", "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 6).as("score_r"))
    }),
    // R2+R3 threshold + dedup-union (retriever.py:135-153)
    "r3_dedup_union" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val hits = VectorSearch.knnJoin(
        emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") >= 8),
        "vec_id", "embedding", "vec_id", "embedding", 20)
      VectorSearch.dedupUnion(VectorSearch.thresholdFilter(hits, 0.2))
        .select(col("neighbor_id"), round(col("score"), 6).as("score_r"), col("best_rank"))
    }),
    // R7 get-by-ids point lookup (milvus.py:429-507)
    "r7_get_by_ids" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val wanted = part.filter(col("p_partkey") % 97 === 0).select("p_partkey")
      VectorSearch.getByIds(part, wanted, "p_partkey")
        .select("p_partkey", "p_name", "p_brand")
    }),
    // R8 filtered KNN (retriever.py:267-285): corpus restricted to label==3.
    "r8_filtered_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val allowed = emb.filter(col("label") === 3).select("vec_id")
      VectorSearch.filteredKnn(
        emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") >= 8), allowed,
        "vec_id", "embedding", "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
    }),

    // ------------------------------------------------------------ classic bench
    // TPC-H Q1-shaped pricing summary (baseline aggregate shape)
    "q1_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),
    // TPC-H Q3-shaped top-10 revenue (join + agg + top-k)
    "q3_top_orders" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    })
  )

  /** DuckDB-dialect oracle per query (driver runs these on the same parquet dirs). */
  def oracleSql: Map[String, String] = {
    val tables = Tables.names
    val statsUnion = tables
      .map(n => s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
      .mkString(" UNION ALL ")
    // shared snippets
    val normDoc = "trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'))"
    val docWords =
      s"""SELECT doc_id, w.word, w.pos FROM (
         |  SELECT doc_id, unnest(list_filter(string_split($normDoc, ' '), x -> x <> '')) AS word,
         |         generate_subscripts(list_filter(string_split($normDoc, ' '), x -> x <> ''), 1) AS pos
         |  FROM documents) w""".stripMargin.replace("\n", " ")
    val knnBase =
      """SELECT CAST(q.vec_id AS VARCHAR) AS query_id,
        |       CAST(c.vec_id AS VARCHAR) AS neighbor_id,
        |       list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS score
        |FROM embeddings q, embeddings c
        |WHERE q.vec_id < 8 AND c.vec_id >= 8""".stripMargin.replace("\n", " ")
    Map(
      "s10_stats" -> statsUnion,
      "s7_upsert" ->
        """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer WHERE c_custkey % 10 <> 0
          |UNION ALL
          |SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS acctbal FROM customer WHERE c_custkey % 10 = 0""".stripMargin.replace("\n", " "),
      "s8_delete" ->
        "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey % 7 <> 3",
      "t2_normalize" ->
        s"SELECT doc_id, $normDoc AS norm_text FROM documents",
      "t3_relation_text" ->
        ("SELECT p_partkey, concat_ws(' ', " +
          "trim(regexp_replace(lower(p_brand), '[^a-z0-9 ]', ' ', 'g')), " +
          "trim(regexp_replace(lower(p_type), '[^a-z0-9 ]', ' ', 'g')), " +
          "trim(regexp_replace(lower(p_name), '[^a-z0-9 ]', ' ', 'g'))) AS relation_text FROM part"),
      "t5_title" ->
        "SELECT doc_id, trim(split_part(text, chr(10), 1)) AS title FROM documents",
      "g1_explode" ->
        s"SELECT doc_id, CAST(pos AS INTEGER) AS pos, word FROM ($docWords) t",
      "g2_entity_dedup" ->
        s"SELECT md5(name) AS id, name FROM (SELECT DISTINCT word AS name FROM ($docWords) t) d",
      "g4_adjacency" ->
        s"""SELECT word, list_sort(list(DISTINCT doc_id)) AS doc_ids,
           |count(DISTINCT doc_id) AS n_docs FROM ($docWords) t GROUP BY word""".stripMargin.replace("\n", " "),
      "g9_cascade" ->
        s"""SELECT word, list_filter(list_sort(list(DISTINCT doc_id)), d -> d <> 0) AS doc_ids_after
           |FROM ($docWords) t GROUP BY word""".stripMargin.replace("\n", " "),
      "e3_l2_normalize" ->
        """SELECT vec_id,
          |CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) = 0
          |     THEN list_transform(embedding::DOUBLE[], x -> round(x, 6))
          |     ELSE list_transform(embedding::DOUBLE[],
          |          x -> round(x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6))
          |END AS unit_vec FROM embeddings""".stripMargin.replace("\n", " "),
      "r1_knn_topk" ->
        s"""SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, round(score, 6) AS score_r FROM (
           |  SELECT query_id, neighbor_id, score,
           |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
           |  FROM ($knnBase) s) r WHERE rank <= 5""".stripMargin.replace("\n", " "),
      "r3_dedup_union" ->
        s"""SELECT neighbor_id, round(max(score), 6) AS score_r, min(rank) AS best_rank FROM (
           |  SELECT query_id, neighbor_id, score,
           |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
           |  FROM ($knnBase) s) r WHERE rank <= 20 AND score > 0.2 GROUP BY neighbor_id""".stripMargin.replace("\n", " "),
      "r7_get_by_ids" ->
        "SELECT p_partkey, p_name, p_brand FROM part WHERE p_partkey % 97 = 0",
      "r8_filtered_knn" ->
        s"""SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
           |  SELECT query_id, neighbor_id,
           |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
           |  FROM ($knnBase AND c.label = 3) s) r WHERE rank <= 5""".stripMargin.replace("\n", " "),
      "q1_pricing" ->
        """SELECT l_returnflag, l_linestatus,
          |round(sum(l_quantity), 2) AS sum_qty,
          |round(sum(l_extendedprice), 2) AS sum_base_price,
          |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          |count(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " "),
      "q3_top_orders" ->
        """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin.replace("\n", " ")
    )
  }
}
