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
  *
  * Writes are plain Parquet with Spark handling file batching (the reference's
  * hand-rolled batch_size=32 insert loop, milvus.py:154-202, is subsumed by the
  * writer). `save` is full-replace like the reference's drop-and-recreate indexing
  * path (rag.py:354-356); incremental CRUD is a separate path (upsert/delete below),
  * exactly as in the reference (SURVEY §7.5).
  */
final class GraphStore(spark: SparkSession, base: String) {

  private val tableNames = Seq(
    "entities", "relations", "passages",
    "entity_relation", "entity_passage", "relation_passage")

  private def path(graph: String, table: String) = s"$base/$graph/$table.parquet"

  /** Primary access key per table: node tables are point-looked-up by id
    * (R7, neighbors, passage-text fetch); edge tables are hop-scanned by their
    * left key (P2/P3 semi-joins, cascade scrubs). */
  private val clusterKey = Map(
    "entities" -> "id", "relations" -> "id", "passages" -> "id",
    "entity_relation" -> "entity_id", "entity_passage" -> "entity_id",
    "relation_passage" -> "relation_id")

  /** Cluster a table by its access key before writing: parquet row-group
    * min/max stats then prune `id = x` / `id IN (...)` reads to a few row
    * groups instead of the full table, and sorted runs compress better. AQE
    * coalesces the clustering shuffle on small data; at 100 TB this is the
    * write-once layout the read path wants. */
  private def clustered(tableName: String, df: DataFrame): DataFrame =
    clusterKey.get(tableName)
      .filter(df.columns.contains(_))
      .map(k => df.repartition(col(k)).sortWithinPartitions(k))
      .getOrElse(df)

  // ----------------------------------------------------------------- S6 / S9
  /** Full-replace write of all six tables. The writes are submitted
    * CONCURRENTLY — they share the build's checkpointed upstream, so parallel
    * submission overlaps their shuffle/write waits instead of paying six
    * sequential job latencies. */
  def save(graph: String, t: GraphTables): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val writes = Seq(
      "entities" -> t.entities, "relations" -> t.relations, "passages" -> t.passages,
      "entity_relation" -> t.entityRelation, "entity_passage" -> t.entityPassage,
      "relation_passage" -> t.relationPassage
    ).map { case (n, df) => Future {
      clustered(n, df).write.mode(SaveMode.Overwrite).parquet(path(graph, n))
    } }
    Await.result(Future.sequence(writes), Duration.Inf)
    // Drop any cached/cached-metadata copies of the replaced tables: long-lived
    // sessions (REST server) would otherwise serve stale rows after re-index.
    tableNames.foreach(n => spark.catalog.refreshByPath(path(graph, n)))
  }

  def load(graph: String): GraphTables = GraphTables(
    entities = table(graph, "entities"),
    relations = table(graph, "relations"),
    passages = table(graph, "passages"),
    entityRelation = table(graph, "entity_relation"),
    entityPassage = table(graph, "entity_passage"),
    relationPassage = table(graph, "relation_passage"))

  def table(graph: String, name: String): DataFrame =
    spark.read.parquet(path(graph, name))

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
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(s"$base/$graph"))
  }

  /** S10 per-collection row counts (milvus.py:980-1014). */
  def stats(graph: String): Map[String, Long] =
    Seq("entities", "relations", "passages")
      .map(n => n -> table(graph, n).count()).toMap

  // ----------------------------------------------------------------- S7 upsert
  /** Read-modify-write merge: rows in `updates` replace same-id rows, others kept
    * (milvus.py:511-713). Delta-style `left_anti ∪ updates` then atomic swap. */
  def upsert(graph: String, tableName: String, updates: DataFrame): Unit = {
    val old = table(graph, tableName)
    val merged = old.join(updates.select("id"), Seq("id"), "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    rewrite(graph, tableName, merged)
  }

  // ----------------------------------------------------------------- S8 delete
  /** Delete by id batch = anti-join (milvus.py:717-843). */
  def delete(graph: String, tableName: String, ids: Seq[String]): Unit = {
    val victims = spark.createDataFrame(ids.map(Tuple1(_))).toDF("id")
    rewrite(graph, tableName, table(graph, tableName).join(victims, Seq("id"), "left_anti"))
  }

  /** G9 cascade delete of a passage: remove the row AND scrub its id from every
    * neighbor's adjacency arrays + edge tables (graph/graph.py:634-672). */
  def deletePassageCascade(graph: String, passageId: String): Unit = {
    delete(graph, "passages", Seq(passageId))
    val scrub = (df: DataFrame) => df.withColumn(
      "passage_ids", array_remove(col("passage_ids"), passageId))
    rewrite(graph, "entities", scrub(table(graph, "entities")))
    rewrite(graph, "relations", scrub(table(graph, "relations")))
    rewrite(graph, "entity_passage",
      table(graph, "entity_passage").filter(col("passage_id") =!= passageId))
    rewrite(graph, "relation_passage",
      table(graph, "relation_passage").filter(col("passage_id") =!= passageId))
  }

  /** G9 cascade delete of an entity (graph/graph.py:237-282): drop the entity, its
    * incident relations, and scrub both from passages' adjacency. */
  def deleteEntityCascade(graph: String, entityId: String): Unit = {
    val doomedRels = table(graph, "entity_relation")
      .filter(col("entity_id") === entityId)
      .select("relation_id").distinct().collect().map(_.getString(0)).toSeq
    delete(graph, "entities", Seq(entityId))
    delete(graph, "relations", doomedRels)
    val dr = doomedRels
    rewrite(graph, "passages",
      table(graph, "passages")
        .withColumn("entity_ids", array_remove(col("entity_ids"), entityId))
        .withColumn("relation_ids",
          filter(col("relation_ids"), r => !r.isin(dr: _*))))
    rewrite(graph, "entities",
      table(graph, "entities").withColumn("relation_ids",
        filter(col("relation_ids"), r => !r.isin(dr: _*))))
    rewrite(graph, "entity_relation",
      table(graph, "entity_relation").filter(!col("relation_id").isin(dr: _*)))
    rewrite(graph, "relation_passage",
      table(graph, "relation_passage").filter(!col("relation_id").isin(dr: _*)))
  }

  /** G9 cascade delete of a relation (graph/graph.py:430-475): drop the relation
    * row, scrub its id from entities' and passages' `relation_ids`, and drop its
    * edge rows — no dangling adjacency survives. */
  def deleteRelationCascade(graph: String, relationId: String): Unit = {
    delete(graph, "relations", Seq(relationId))
    rewrite(graph, "entities",
      table(graph, "entities").withColumn("relation_ids",
        array_remove(col("relation_ids"), relationId)))
    rewrite(graph, "passages",
      table(graph, "passages").withColumn("relation_ids",
        array_remove(col("relation_ids"), relationId)))
    rewrite(graph, "entity_relation",
      table(graph, "entity_relation").filter(col("relation_id") =!= relationId))
    rewrite(graph, "relation_passage",
      table(graph, "relation_passage").filter(col("relation_id") =!= relationId))
  }

  /** S7 upsert with re-embedding on text change (milvus.py:511-574): fields the
    * update doesn't mention keep their stored values, and the embedding is
    * recomputed exactly when the row is new or its `text` changed — an updated
    * passage never keeps a stale vector. `updates` needs only (id, text, ...);
    * any `embedding` column in it is ignored in favor of the recompute rule. */
  def upsertReembed(graph: String, tableName: String, updates: DataFrame,
      embedder: graft.functions.Embedder): Unit = {
    val old = table(graph, tableName)
    val upd = updates.drop("embedding")
    val updCols = upd.columns.toSet
    val merged = old.as("o").join(upd.as("n"), Seq("id"), "full_outer")
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
    rewrite(graph, tableName, merged)
  }

  /** Replace a table's contents with an arbitrary derived DataFrame (may read
    * from the current contents — goes through materialize-then-swap). */
  def replaceTable(graph: String, tableName: String, df: DataFrame): Unit =
    rewrite(graph, tableName, df)

  /** Materialize-then-swap: parquet can't be rewritten in place from itself. */
  private def rewrite(graph: String, tableName: String, df: DataFrame): Unit = {
    val tmp = path(graph, s"__tmp_$tableName")
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = path(graph, tableName)
    clustered(tableName, spark.read.parquet(tmp))
      .write.mode(SaveMode.Overwrite).parquet(dst)
    dropPath(tmp)
    // Invalidate caches over the replaced files (see save()).
    spark.catalog.refreshByPath(dst)
  }

  private def dropPath(s: String): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(s))
  }
}
