package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton) data layout — multi-dimensional locality for 100 TB scan
  * pruning: rows sorted by the bit-interleaved key of several columns land
  * near their neighbors in EVERY dimension, so parquet min/max row-group
  * stats (and partition-level sorting) prune selective filters on ANY of the
  * interleaved columns, not just the leading sort key. The lakehouse
  * standard for multi-filter fact tables (Delta/Iceberg expose the same op);
  * here it is a plain deterministic expression + range repartition, nothing
  * engine-specific.
  *
  * The key is pure bit arithmetic (shift/and/or of longs) — codegen'd end to
  * end, no UDF, and expressible 1:1 in SQL for the oracle.
  */
object Layout {

  /** Morton key: bit `i` of column `c` lands at position `i * nCols + c`.
    * Columns must be non-negative integers; only the low `bits` bits of each
    * participate (values ≥ 2^bits still produce a deterministic key but
    * break locality — normalize or bucket upstream). `bits * nCols ≤ 63`
    * keeps the key in a signed long. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits=$bits × ${cols.size} cols must fit a signed long (≤ 63 bits)")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + ci)
    terms.reduce(_ + _)
  }

  /** Cluster `df` for writing: range-repartition on the Morton key (contiguous
    * non-overlapping key ranges per partition — the property that makes
    * file-level min/max pruning work) and sort rows within each partition.
    * The key column is dropped again; pass the result straight to a writer. */
  def clusterBy(df: DataFrame, cols: Seq[String], bits: Int,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1)
    df.withColumn("__z", zorderKey(cols.map(col), bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
