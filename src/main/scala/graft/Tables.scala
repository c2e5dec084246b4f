package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Accessors for the driver-generated testdata tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` contract: epoch-NANOSECOND LongType, whatever the parquet
    * physical type. Early testdata generations wrote TIMESTAMP_NS, which
    * Spark only reads via `legacy.parquet.nanosAsLong` (→ ns LongType, the
    * type every downstream window/session/range operator computes in);
    * round 9's regeneration writes TIMESTAMP(µs), which arrives as a real
    * timestamp column. Normalizing HERE — exact integer µs→ns, no float
    * path — keeps every consumer and its DuckDB twin (`epoch_ns(ts)` reads
    * both physical types natively) unchanged across driver data swaps.
    * NTZ values are cast through the session zone, pinned UTC everywhere. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    } else df
  }
}
