package graft.sources

import graft.operators.GraphTables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parquet-backed graph catalog (SURVEY §2.1 S6–S10).
  *
  * Layout: `{base}/{graph}/{entities|relations|passages|entity_relation|
  * entity_passage|relation_passage}.parquet` — one directory per graph, mirroring
  * the reference's prefix-namespaced Milvus collections (milvus.py:121-152).
  * Every table is hash-bucketed by its primary access key ([[BucketedTable]]):
  * node tables by `id`, edge tables by their hop key. Single-row CRUD (upsert,
  * delete, the G9 cascades, incremental graft) rewrites ONLY the buckets
  * containing the touched ids — at 100 TB a passage delete is a handful of
  * bucket rewrites plus narrow edge-table scans, not six full-table rewrites.
  *
  * `save` is full-replace like the reference's drop-and-recreate indexing
  * path (rag.py:354-356); incremental CRUD is a separate path (upsert/delete
  * below), exactly as in the reference (SURVEY §7.5).
  */
final class GraphStore(spark: SparkSession, base: String,
    nBuckets: Int = BucketedTable.DefaultBuckets) {

  private val tableNames = Seq(
    "entities", "relations", "passages",
    "entity_relation", "entity_passage", "relation_passage")

  private def path(graph: String, table: String) = s"$base/$graph/$table.parquet"

  /** Primary access key per table: node tables are point-looked-up by id
    * (R7, neighbors, passage-text fetch); edge tables are hop-scanned by their
    * left key (P2/P3 semi-joins, cascade scrubs). The key is also the bucket
    * key, so point CRUD prunes to one partition directory and, within it,
    * sorted row groups. */
  private val clusterKey = Map(
    "entities" -> "id", "relations" -> "id", "passages" -> "id",
    "entity_relation" -> "entity_id", "entity_passage" -> "entity_id",
    "relation_passage" -> "relation_id")

  /** The bucket count is a LAYOUT property of each stored graph, persisted in
    * a marker file at write time: a store handle opened with a different
    * default must keep pruning with the count the data was actually bucketed
    * with, or every point lookup would read (and every CRUD op rewrite) the
    * wrong partition directories. */
  private val graphBuckets = scala.collection.concurrent.TrieMap.empty[String, Int]
  private def markerPath(graph: String) = s"$base/$graph/_nbuckets"

  private def bucketsFor(graph: String): Int =
    graphBuckets.getOrElseUpdate(graph,
      BucketedTable.readMarker(spark, markerPath(graph))
        .flatMap(s => scala.util.Try(s.toInt).toOption)
        .getOrElse(nBuckets))

  private def bucketOf(graph: String, id: String): Int =
    BucketedTable.bucketOf(id, bucketsFor(graph))

  // ----------------------------------------------------------------- S6 / S9
  /** Full-replace write of all six tables. The writes are submitted
    * CONCURRENTLY — they share the build's checkpointed upstream, so parallel
    * submission overlaps their shuffle/write waits instead of paying six
    * sequential job latencies. */
  def save(graph: String, t: GraphTables): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // save is full-replace, so the graph adopts THIS handle's bucket count.
    graphBuckets.put(graph, nBuckets)
    BucketedTable.writeMarker(spark, markerPath(graph), nBuckets.toString)
    val writes = Seq(
      "entities" -> t.entities, "relations" -> t.relations, "passages" -> t.passages,
      "entity_relation" -> t.entityRelation, "entity_passage" -> t.entityPassage,
      "relation_passage" -> t.relationPassage
    ).map { case (n, df) => Future {
      BucketedTable.write(df, path(graph, n), clusterKey(n), nBuckets)
    } }
    Await.result(Future.sequence(writes), Duration.Inf)
    // Drop any cached/cached-metadata copies of the replaced tables: long-lived
    // sessions (REST server) would otherwise serve stale rows after re-index.
    tableNames.foreach { n =>
      invalidateCache(graph, n)
      dropAnnIndex(graph, n)
      spark.catalog.refreshByPath(path(graph, n))
    }
    dropLexIndex(graph)
  }

  def load(graph: String): GraphTables = GraphTables(
    entities = table(graph, "entities"),
    relations = table(graph, "relations"),
    passages = table(graph, "passages"),
    entityRelation = table(graph, "entity_relation"),
    entityPassage = table(graph, "entity_passage"),
    relationPassage = table(graph, "relation_passage"))

  /** Public reads never expose the `_bucket` layout column. */
  def table(graph: String, name: String): DataFrame =
    BucketedTable.read(spark, path(graph, name)).drop("_bucket")

  // ------------------------------------------------------------ cache registry
  /** One persisted copy per (graph, table), shared by every query against the
    * graph and unpersisted on any write to that table — a long-lived server
    * neither re-scans parquet per request nor accumulates stale cache entries
    * across re-indexes (the reference leans on Milvus' resident index for the
    * same reason). */
  private val cacheRegistry =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def cachedTable(graph: String, name: String): DataFrame =
    cacheRegistry.getOrElseUpdate((graph, name), table(graph, name).cache())

  /** Number of live registry entries (test/observability hook). */
  def cachedTableCount: Int = cacheRegistry.size

  private def invalidateCache(graph: String, name: String): Unit =
    cacheRegistry.remove((graph, name)).foreach(_.unpersist(blocking = false))

  /** Bucket-pruned point read: only the partition directories holding `keys`'
    * buckets are scanned (the caller still applies its exact key predicate). */
  private def pruned(graph: String, name: String, keys: Seq[String]): DataFrame = {
    val buckets = keys.map(bucketOf(graph, _)).distinct
    BucketedTable.read(spark, path(graph, name))
      .filter(col("_bucket").isin(buckets: _*)).drop("_bucket")
  }

  /** S9 graph discovery = directory listing (milvus.py:847-978). */
  def listGraphs(): Seq[String] = {
    val p = Paths.get(base)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** S9 drop. */
  def dropGraph(graph: String): Unit = {
    tableNames.foreach(invalidateCache(graph, _))
    graphBuckets.remove(graph)
    BucketedTable.deleteDir(spark, s"$base/$graph")
  }

  /** S10 per-collection row counts (milvus.py:980-1014). */
  def stats(graph: String): Map[String, Long] =
    Seq("entities", "relations", "passages")
      .map(n => n -> table(graph, n).count()).toMap

  // -------------------------------------------------------------- ANN indexes
  /** Persisted IVF index over a node table's embeddings — the reference's
    * resident vector index (AUTOINDEX, config.py:43-50) as a DERIVED artifact:
    * built at indexing time and MAINTAINED through embedding-preserving
    * writes (grafts add, deletes/cascades remove — cell-pruned both ways);
    * any write that could change a surviving embedding (save, upsert) drops
    * it, so a stale index can never serve a query — readers fall back to
    * exact KNN until it is rebuilt. */
  private def annPath(graph: String, tableName: String) =
    s"$base/$graph/ivf_$tableName"

  def saveAnnIndex(graph: String, tableName: String,
      index: graft.operators.IvfIndex.Index): Unit =
    graft.operators.IvfIndex.save(index, annPath(graph, tableName))

  /** Persist an IVF-PQ index at the same derived-artifact path (mutually
    * exclusive with the plain IVF layout — the PQ codebook file is the
    * discriminator every reader/maintainer dispatches on). Same lifecycle:
    * dropped by any base-table write, extended add-only through grafts. */
  def saveAnnIndexPq(graph: String, tableName: String, rows: DataFrame,
      nList: Int, m: Int, dsub: Int, k: Int, pqIters: Int = 0): Unit =
    graft.operators.IvfPq.buildAndSave(rows, "id", "embedding",
      annPath(graph, tableName), nList, m, dsub, k, pqIters)

  /** Whether the saved ANN artifact is the IVF-PQ layout (codebook present)
    * rather than the plain IVF inverted file. */
  def annIndexIsPq(graph: String, tableName: String): Boolean =
    BucketedTable.exists(spark, s"${annPath(graph, tableName)}/codebook.parquet")

  def loadAnnIndex(graph: String, tableName: String)
      : Option[graft.operators.IvfIndex.Index] =
    if (BucketedTable.exists(spark, annPath(graph, tableName)) &&
        !annIndexIsPq(graph, tableName))
      Some(graft.operators.IvfIndex.load(spark, annPath(graph, tableName)))
    else None

  /** Probe-limited search over the persisted IVF-PQ artifact; None when the
    * saved layout is not PQ (callers fall back to [[loadAnnIndex]]/exact). */
  def searchAnnIndexPq(graph: String, tableName: String, queries: DataFrame,
      qId: String, qVec: String, nProbe: Int, k: Int): Option[DataFrame] =
    if (annIndexIsPq(graph, tableName))
      Some(graft.operators.IvfPq.searchSaved(
        spark, annPath(graph, tableName), queries, qId, qVec, nProbe, k))
    else None

  private def dropAnnIndex(graph: String, tableName: String): Unit =
    if (BucketedTable.exists(spark, annPath(graph, tableName)))
      BucketedTable.deleteDir(spark, annPath(graph, tableName))

  // ------------------------------------------------------------ lexical index
  /** Persisted BM25 index over the passages table — the lexical twin of the
    * ANN index ([[graft.operators.Bm25]]), for hybrid dense+sparse retrieval.
    * Built at indexing time, dropped by ANY write touching passages: even the
    * embedding-preserving graft merge shifts df/avgdl corpus-wide, so a
    * lexical index is rebuilt, never extended in place. */
  private def lexPath(graph: String) = s"$base/$graph/bm25_passages"

  def saveLexIndex(graph: String, index: graft.operators.Bm25.Index): Unit =
    graft.operators.Bm25.save(index, lexPath(graph))

  def loadLexIndex(graph: String): Option[graft.operators.Bm25.Index] =
    if (BucketedTable.exists(spark, lexPath(graph)))
      Some(graft.operators.Bm25.load(spark, lexPath(graph)))
    else None

  /** Term-bucket-pruned scoring against the saved lexical index (reads only
    * the query terms' buckets — [[graft.operators.Bm25.scoreSaved]]). */
  def scoreLexIndex(graph: String, queries: DataFrame, qId: String,
      qText: String, k: Int): Option[DataFrame] =
    if (BucketedTable.exists(spark, lexPath(graph)))
      Some(graft.operators.Bm25.scoreSaved(spark, lexPath(graph), queries, qId, qText, k))
    else None

  private def dropLexIndex(graph: String): Unit =
    if (BucketedTable.exists(spark, lexPath(graph)))
      BucketedTable.deleteDir(spark, lexPath(graph))

  def lexIndexExists(graph: String): Boolean =
    BucketedTable.exists(spark, lexPath(graph))

  def annIndexExists(graph: String, tableName: String): Boolean =
    BucketedTable.exists(spark, annPath(graph, tableName))

  /** (file count, bytes) of a table's parquet directory from the FileSystem
    * listing — the compaction-trigger read ([[graft.operators.Layout.compact]]),
    * no data pass. */
  def tableFileStats(graph: String, name: String): (Int, Long) =
    graft.operators.Layout.fileStats(spark, path(graph, name))

  /** Incrementally add `docs(id, text)` to the persisted lexical index —
    * no-op when none exists. Rebuild-exact ([[graft.operators.Bm25.addSavedDocs]]);
    * already-indexed ids are skipped, so callers replacing a passage's TEXT
    * must [[deleteFromLexIndex]] the old rows first. */
  def addToLexIndex(graph: String, docs: DataFrame): Unit =
    if (lexIndexExists(graph))
      graft.operators.Bm25.addSavedDocs(spark, lexPath(graph), docs, "id", "text")

  /** Incrementally remove `docs(id, text)` — the rows AS INDEXED — from the
    * persisted lexical index; no-op when none exists. */
  def deleteFromLexIndex(graph: String, docs: DataFrame): Unit =
    if (lexIndexExists(graph))
      graft.operators.Bm25.deleteSavedDocs(spark, lexPath(graph), docs, "id", "text")

  /** Incrementally add rows (id, embedding, ...) to a persisted ANN index —
    * no-op when none exists. Add-only ([[graft.operators.IvfIndex.addSaved]]):
    * ids already indexed keep their cells, so this is only correct after
    * writes that never change an existing row's embedding (the graft merge's
    * old-wins coalesce). Writes without that guarantee must drop the index
    * (the default) instead. At 100 TB this rewrites a handful of cell
    * directories per grafted batch; the alternative — rebuild per write —
    * would re-cluster the full table. */
  def addToAnnIndex(graph: String, tableName: String, rows: DataFrame): Unit =
    if (BucketedTable.exists(spark, annPath(graph, tableName))) {
      // layout dispatch: a PQ codebook means the artifact is IVF-PQ and the
      // delta must be encoded with the SAVED codebooks; otherwise plain IVF
      if (annIndexIsPq(graph, tableName))
        graft.operators.IvfPq.addSaved(
          spark, annPath(graph, tableName), rows, "id", "embedding")
      else
        graft.operators.IvfIndex.addSaved(
          spark, annPath(graph, tableName), rows, "id", "embedding")
    }

  // ----------------------------------------------------------------- S7 upsert
  /** Read-modify-write merge: rows in `updates` replace same-id rows, others kept
    * (milvus.py:511-713). Only the buckets containing update ids are rewritten. */
  def upsert(graph: String, tableName: String, updates: DataFrame): Unit =
    rewriteForKeys(graph, tableName, updates, "id") { old =>
      old.join(updates.select("id"), Seq("id"), "left_anti")
        .unionByName(updates, allowMissingColumns = true)
    }

  // ----------------------------------------------------------------- S8 delete
  /** Delete by id batch = anti-join (milvus.py:717-843), pruned to the victims'
    * buckets. */
  def delete(graph: String, tableName: String, ids: Seq[String]): Unit = {
    if (ids.isEmpty) return
    val victims = spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
    // a pure delete never changes a surviving row's embedding, so the ANN
    // index is MAINTAINED (cell-pruned id removal) instead of dropped — at
    // 100 TB a one-row delete must not invalidate the whole clustering
    rewriteBuckets(graph, tableName, ids.map(bucketOf(graph, _)).distinct,
      preserveAnnIndex = true)(
      _.join(victims, Seq("id"), "left_anti"))
    deleteFromAnnIndex(graph, tableName, ids)
  }

  /** Incrementally remove ids from a persisted ANN index — no-op when none
    * exists; layout-dispatched like [[addToAnnIndex]]. Always valid for pure
    * deletes (surviving embeddings are untouched); writes that may change an
    * embedding must drop the index instead (the rewrite default). */
  def deleteFromAnnIndex(graph: String, tableName: String, ids: Seq[String]): Unit =
    if (BucketedTable.exists(spark, annPath(graph, tableName))) {
      if (annIndexIsPq(graph, tableName))
        graft.operators.IvfPq.deleteSaved(spark, annPath(graph, tableName), ids)
      else
        graft.operators.IvfIndex.deleteSaved(spark, annPath(graph, tableName), ids)
    }

  /** G9 cascade delete of a passage: remove the row AND scrub its id from every
    * neighbor's adjacency arrays + edge tables (graph/graph.py:634-672).
    * The referencing entities/relations come from the edge tables (narrow
    * read-only scans); every rewrite below is pruned to their buckets. */
  def deletePassageCascade(graph: String, passageId: String): Unit = {
    val entBuckets = BucketedTable.distinctBuckets(
      table(graph, "entity_passage").filter(col("passage_id") === passageId),
      "entity_id", bucketsFor(graph))
    val relBuckets = BucketedTable.distinctBuckets(
      table(graph, "relation_passage").filter(col("passage_id") === passageId),
      "relation_id", bucketsFor(graph))
    // the cascade deletes rows and scrubs adjacency ARRAYS — no surviving
    // embedding or passage text changes — so both derived indexes are
    // MAINTAINED: the doomed passage leaves the lexical index under its
    // stored text (pinned before the rewrite replaces the files)
    if (lexIndexExists(graph)) {
      val oldRow = pruned(graph, "passages", Seq(passageId))
        .filter(col("id") === passageId).select("id", "text")
        .localCheckpoint(true)
      deleteFromLexIndex(graph, oldRow)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoint(oldRow)
    }
    rewriteBuckets(graph, "passages", Seq(bucketOf(graph, passageId)),
      preserveAnnIndex = true, preserveLexIndex = true)(
      _.filter(col("id") =!= passageId))
    rewriteBuckets(graph, "entities", entBuckets, preserveAnnIndex = true)(
      _.withColumn("passage_ids", array_remove(col("passage_ids"), passageId)))
    rewriteBuckets(graph, "relations", relBuckets, preserveAnnIndex = true)(
      _.withColumn("passage_ids", array_remove(col("passage_ids"), passageId)))
    rewriteBuckets(graph, "entity_passage", entBuckets)(
      _.filter(col("passage_id") =!= passageId))
    rewriteBuckets(graph, "relation_passage", relBuckets)(
      _.filter(col("passage_id") =!= passageId))
  }

  /** G9 cascade delete of an entity (graph/graph.py:237-282): drop the entity, its
    * incident relations, and scrub both from passages' adjacency. */
  def deleteEntityCascade(graph: String, entityId: String): Unit = {
    val eb = bucketOf(graph, entityId)
    // incident relations: bucket-pruned lookup (entity_relation is keyed by entity)
    val dr = pruned(graph, "entity_relation", Seq(entityId))
      .filter(col("entity_id") === entityId)
      .select("relation_id").distinct().collect().map(_.getString(0)).toSeq
    val drBuckets = dr.map(bucketOf(graph, _)).distinct
    // entities sharing a doomed relation (their relation_ids need scrubbing)
    val refEntBuckets =
      if (dr.isEmpty) Seq.empty[Int]
      else BucketedTable.distinctBuckets(
        table(graph, "entity_relation").filter(col("relation_id").isin(dr: _*)),
        "entity_id", bucketsFor(graph))
    // passages referencing the entity or a doomed relation
    val passRefsE = pruned(graph, "entity_passage", Seq(entityId))
      .filter(col("entity_id") === entityId).select("passage_id")
    val passRefs =
      if (dr.isEmpty) passRefsE
      else passRefsE.unionByName(
        pruned(graph, "relation_passage", dr)
          .filter(col("relation_id").isin(dr: _*)).select("passage_id"))
    val passBuckets = BucketedTable.distinctBuckets(passRefs, "passage_id", bucketsFor(graph))

    // delete + adjacency scrub only — the ANN indexes are maintained (the
    // doomed entity and its incident relations leave them explicitly) and
    // the lexical index is untouched (passage TEXT never changes here)
    rewriteBuckets(graph, "entities", (eb +: refEntBuckets).distinct,
      preserveAnnIndex = true) { df =>
      val kept = df.filter(col("id") =!= entityId)
      if (dr.isEmpty) kept
      else kept.withColumn("relation_ids",
        filter(col("relation_ids"), r => !r.isin(dr: _*)))
    }
    if (dr.nonEmpty)
      rewriteBuckets(graph, "relations", drBuckets, preserveAnnIndex = true)(
        _.filter(!col("id").isin(dr: _*)))
    rewriteBuckets(graph, "passages", passBuckets,
      preserveAnnIndex = true, preserveLexIndex = true) { df =>
      val scrubbed = df.withColumn("entity_ids", array_remove(col("entity_ids"), entityId))
      if (dr.isEmpty) scrubbed
      else scrubbed.withColumn("relation_ids",
        filter(col("relation_ids"), r => !r.isin(dr: _*)))
    }
    deleteFromAnnIndex(graph, "entities", Seq(entityId))
    if (dr.nonEmpty) deleteFromAnnIndex(graph, "relations", dr)
    rewriteBuckets(graph, "entity_relation", (eb +: refEntBuckets).distinct) { df =>
      val noEnt = df.filter(col("entity_id") =!= entityId)
      if (dr.isEmpty) noEnt else noEnt.filter(!col("relation_id").isin(dr: _*))
    }
    if (dr.nonEmpty)
      rewriteBuckets(graph, "relation_passage", drBuckets)(
        _.filter(!col("relation_id").isin(dr: _*)))
  }

  /** G9 cascade delete of a relation (graph/graph.py:430-475): drop the relation
    * row, scrub its id from entities' and passages' `relation_ids`, and drop its
    * edge rows — no dangling adjacency survives. */
  def deleteRelationCascade(graph: String, relationId: String): Unit = {
    val rb = Seq(bucketOf(graph, relationId))
    val entBuckets = BucketedTable.distinctBuckets(
      table(graph, "entity_relation").filter(col("relation_id") === relationId),
      "entity_id", bucketsFor(graph))
    val passBuckets = BucketedTable.distinctBuckets(
      pruned(graph, "relation_passage", Seq(relationId))
        .filter(col("relation_id") === relationId),
      "passage_id", bucketsFor(graph))
    // same maintenance contract as the entity cascade: delete + scrub only
    rewriteBuckets(graph, "relations", rb, preserveAnnIndex = true)(
      _.filter(col("id") =!= relationId))
    rewriteBuckets(graph, "entities", entBuckets, preserveAnnIndex = true)(
      _.withColumn("relation_ids", array_remove(col("relation_ids"), relationId)))
    rewriteBuckets(graph, "passages", passBuckets,
      preserveAnnIndex = true, preserveLexIndex = true)(
      _.withColumn("relation_ids", array_remove(col("relation_ids"), relationId)))
    deleteFromAnnIndex(graph, "relations", Seq(relationId))
    rewriteBuckets(graph, "entity_relation", entBuckets)(
      _.filter(col("relation_id") =!= relationId))
    rewriteBuckets(graph, "relation_passage", rb)(
      _.filter(col("relation_id") =!= relationId))
  }

  /** S7 upsert with re-embedding on text change (milvus.py:511-574): fields the
    * update doesn't mention keep their stored values, and the embedding is
    * recomputed exactly when the row is new or its `text` changed — an updated
    * passage never keeps a stale vector. `updates` needs only (id, text, ...);
    * any `embedding` column in it is ignored in favor of the recompute rule. */
  def upsertReembed(graph: String, tableName: String, updates: DataFrame,
      embedder: graft.functions.Embedder): Unit = {
    val upd = updates.drop("embedding")
    val updCols = upd.columns.toSet
    rewriteForKeys(graph, tableName, upd, "id") { old =>
      old.as("o").join(upd.as("n"), Seq("id"), "full_outer")
        .select(old.columns.toIndexedSeq.map {
          case "id" => col("id")
          case "embedding" =>
            when(col("n.text").isNull || col("o.text") === col("n.text"),
              col("o.embedding"))
              .otherwise(embedder.embed(col("n.text"))).as("embedding")
          case c if updCols.contains(c) => coalesce(col(s"n.$c"), col(s"o.$c")).as(c)
          case c => old.schema(c).dataType match {
            // a genuinely-new row must not carry null adjacency arrays —
            // downstream array ops and the REST document view expect [] not null
            case at: org.apache.spark.sql.types.ArrayType =>
              coalesce(col(s"o.$c"), array().cast(at)).as(c)
            case _ => col(s"o.$c").as(c)
          }
        }: _*)
    }
  }

  /** Replace a table's contents with an arbitrary derived DataFrame (may read
    * from the current contents — goes through materialize-then-swap). */
  def replaceTable(graph: String, tableName: String, df: DataFrame): Unit =
    rewrite(graph, tableName, df)

  /** Bucket-pruned read-modify-write for incremental merges (G8 graft, the
    * streaming sink): `f` sees ONLY the buckets containing `keys[keyCol]`'s
    * values and its output replaces exactly those buckets. `f` must emit rows
    * whose keys stay inside those buckets — true for any merge that only
    * touches/inserts the given keys.
    *
    * `preserveAnnIndex` keeps the table's persisted ANN index alive through
    * the rewrite — ONLY valid when `f` never changes an existing row's
    * embedding (insert-new + adjacency-merge shapes); the caller then appends
    * the genuinely-new rows via [[addToAnnIndex]]. */
  def rewriteForKeys(graph: String, tableName: String, keys: DataFrame,
      keyCol: String, preserveAnnIndex: Boolean = false,
      preserveLexIndex: Boolean = false)(
      f: DataFrame => DataFrame): Unit =
    rewriteBuckets(graph, tableName,
      BucketedTable.distinctBuckets(keys, keyCol, bucketsFor(graph)),
      preserveAnnIndex, preserveLexIndex)(f)

  private def rewriteBuckets(graph: String, tableName: String, buckets: Seq[Int],
      preserveAnnIndex: Boolean = false,
      preserveLexIndex: Boolean = false)(f: DataFrame => DataFrame): Unit = {
    BucketedTable.rewriteBuckets(
      spark, path(graph, tableName), clusterKey(tableName), bucketsFor(graph), buckets)(f)
    // Invalidate caches and derived indexes over the replaced files (see save()).
    invalidateCache(graph, tableName)
    if (!preserveAnnIndex) dropAnnIndex(graph, tableName)
    // preserveLexIndex: ONLY valid when the caller maintains the index
    // itself (delete-old + add-new around the rewrite, the graft path)
    if (tableName == "passages" && !preserveLexIndex) dropLexIndex(graph)
    spark.catalog.refreshByPath(path(graph, tableName))
  }

  /** Materialize-then-swap full rewrite: parquet can't be rewritten in place
    * from itself, and the derived frame may be table-sized (unlike the bucket
    * path, which bounds what it materializes). */
  private def rewrite(graph: String, tableName: String, df: DataFrame): Unit = {
    val tmp = path(graph, s"__tmp_$tableName")
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = path(graph, tableName)
    BucketedTable.write(spark.read.parquet(tmp), dst, clusterKey(tableName), bucketsFor(graph))
    BucketedTable.deleteDir(spark, tmp)
    // Invalidate caches and derived indexes over the replaced files (see save()).
    invalidateCache(graph, tableName)
    dropAnnIndex(graph, tableName)
    if (tableName == "passages") dropLexIndex(graph)
    spark.catalog.refreshByPath(dst)
  }
}
