package graft

import org.apache.spark.sql.types._

/** Structural guard for the driver comparator's one hard constraint: the final
  * projection of EVERY board query must be scalar-only. The driver sorts
  * result rows by every column in pandas before hashing, and pandas cannot
  * sort ndarray cells (`TypeError: unhashable type: 'numpy.ndarray'`) — a raw
  * array/map/struct column turns a semantically-correct query into a red board
  * row (the r11 `sim5_label_prototypes` incident). Arrays must be serialized
  * (house convention: `array_join` of per-element strings, doubles via a
  * decimal(18,6) cast so both engines print fixed-point).
  *
  * Building the plan is lazy — `fn(spark, dir).schema` resolves the analyzed
  * schema without executing the query — so this covers all queries cheaply;
  * only queries whose CONSTRUCTION is eager (collect-backed literals, index
  * training) do real work, at sf0.001.
  */
class OutputSchemaSpec extends SparkSpec {

  private def isScalar(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  private val dir = "/root/testdata/sf0.001"

  // Built ONCE and shared by both tests: constructing a board plan is not
  // free (collect-backed literals, index/codebook training run eagerly), so
  // each query's schema is resolved a single time per suite execution.
  private lazy val schemas: Seq[(String, org.apache.spark.sql.types.StructType)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) => name -> fn(spark, dir).schema
    }

  test("every board query's final projection is scalar-only") {
    val offenders = schemas.flatMap {
      case (name, schema) =>
        val bad = schema.fields.collect {
          case f if !isScalar(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
        }
        if (bad.isEmpty) None
        else Some(s"$name ships non-scalar column(s) [${bad.mkString(", ")}] — " +
          "serialize with array_join (doubles via decimal(18,6) cast) on BOTH engines")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // The driver's hash is dtype-sensitive: a STRING doc_id against a BIGINT
  // oracle column hash-mismatches even when every cell prints identically
  // (the r13 x39 red). Guard: any output column that NAMES a source-table id
  // column must keep that source column's exact type.
  test("board rows keep source id-column types") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val idTypes: Map[String, DataType] = tables.flatMap { t =>
      spark.read.parquet(s"$dir/$t.parquet").schema.fields.collect {
        case f if f.name.endsWith("_id") || f.name.endsWith("key") =>
          f.name -> f.dataType
      }
    }.toMap
    val offenders = schemas.flatMap {
      case (name, schema) =>
        schema.fields.collect {
          case f if idTypes.get(f.name).exists(_ != f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString} != source " +
              idTypes(f.name).simpleString
        }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // BIGINT ids must round-trip through every index-keyed scorer: the index
  // canonicalizes keys to string internally, but the OUTPUT restores the
  // source dtype (the TextRank pattern) — no call-site casts needed. Covers
  // the built index, the SAVED index (dtype rides the stats marker), and all
  // four scorers the r14 carve-out used to exempt.
  test("BIGINT ids round-trip through Bm25/QueryLikelihood/TfIdf/HybridFusion") {
    import graft.operators.{Bm25, HybridFusion, QueryLikelihood, TfIdf}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq((10L, "alpha beta gamma"), (2L, "beta beta delta"),
      (7L, "gamma delta alpha")).toDF("doc_id", "text")
    val queries = Seq((1L, "alpha delta"), (2L, "beta")).toDF("qid", "qtext")
    def idTypes(df: org.apache.spark.sql.DataFrame): (DataType, DataType) =
      (df.schema("query_id").dataType, df.schema("doc_id").dataType)

    val idx = Bm25.build(docs, "doc_id", "text")
    val bm = Bm25.score(idx, queries, "qid", "qtext", k = 3)
    assert(idTypes(bm) == (LongType, LongType), s"Bm25.score: ${bm.schema}")
    assert(bm.select("doc_id").as[Long].collect().toSet.subsetOf(Set(10L, 2L, 7L)))

    val ql = QueryLikelihood.score(idx, queries, "qid", "qtext", mu = 10.0, k = 3)
    assert(idTypes(ql) == (LongType, LongType), s"QueryLikelihood: ${ql.schema}")

    val w = TfIdf.weights(docs, "doc_id", "text")
    assert(w.schema("id").dataType == LongType, "weights erase the id dtype")
    val tf = TfIdf.topK(w, queries, "qid", "qtext", k = 3)
    assert(idTypes(tf) == (LongType, LongType), s"TfIdf.topK: ${tf.schema}")

    val fused = HybridFusion.rrf(Seq(
      bm.select("query_id", "rank", "doc_id"),
      tf.select("query_id", "rank", "doc_id")), k = 3)
    assert(idTypes(fused) == (LongType, LongType), s"rrf: ${fused.schema}")

    // persisted index: the dtype survives save/load and scoreSaved
    val dir = java.nio.file.Files.createTempDirectory("bm25dtype").toString
    Bm25.save(idx, dir)
    assert(Bm25.load(spark, dir).idType == LongType)
    val sv = Bm25.scoreSaved(spark, dir, queries, "qid", "qtext", k = 3)
    assert(idTypes(sv) == (LongType, LongType), s"scoreSaved: ${sv.schema}")
    // and maintenance rewrites preserve it
    Bm25.addSavedDocs(spark, dir, Seq((99L, "epsilon zeta")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(Bm25.load(spark, dir).idType == LongType)
    // prfScore restores too (fb loop runs on the raw string kernel internally)
    val prf = Bm25.prfScore(idx, queries, "qid", "qtext", k = 3,
      fbDocs = 2, fbTerms = 2)
    assert(idTypes(prf) == (LongType, LongType), s"prfScore: ${prf.schema}")
  }
}
