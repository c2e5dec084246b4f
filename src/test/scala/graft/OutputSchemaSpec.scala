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
}
