package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Hash-bucketed parquet tables with partition-pruned read-modify-write.
  *
  * Layout: `{path}/_bucket=N/part-*.parquet` — a standard Spark partitioned
  * parquet directory whose partition column is `_bucket = md5-hash(key) mod
  * nBuckets`. Single-row and small-batch CRUD then reads and REWRITES only the
  * buckets containing the touched keys (`replaceWhere`-shaped dynamic partition
  * overwrite) instead of rewriting the whole table: at 100 TB a one-passage
  * delete touches a handful of ~(tableSize/nBuckets) buckets, not the table.
  * The reference rewrites per-row too (milvus.py:511-713 read-modify-write) —
  * this is the same contract with bounded write amplification.
  *
  * The bucket count is a layout constant per table (default 16 for local test
  * scale; a 100 TB deployment would choose 1024–4096 so a bucket stays a few
  * GB and the bucketing shuffle keeps cluster-wide parallelism). Within each
  * bucket, rows are sorted by the key so parquet row-group min/max stats prune
  * point lookups to a few row groups.
  *
  * All filesystem access goes through the Hadoop FileSystem API, so the same
  * code addresses HDFS/S3 paths on a cluster.
  */
object BucketedTable {

  val DefaultBuckets: Int = 16

  /** Bucket of a key column — first 6 hex chars of md5, mod n. Computable
    * identically driver-side ([[bucketOf]]) so point ops can prune without a
    * Spark job. */
  def bucketCol(key: Column, n: Int): Column =
    pmod(conv(substring(md5(key), 1, 6), 16, 10).cast("long"), lit(n.toLong)).cast("int")

  /** Driver-side twin of [[bucketCol]] (md5 of the UTF-8 bytes, same prefix). */
  def bucketOf(id: String, n: Int): Int =
    (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(id).substring(0, 6), 16) % n).toInt

  /** Distinct buckets of a key column — at most n values ever reach the driver. */
  def distinctBuckets(df: DataFrame, keyCol: String, n: Int): Seq[Int] =
    df.select(bucketCol(col(keyCol), n).as("_b")).distinct()
      .collect().map(_.getInt(0)).toSeq

  private def fileSystem(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, path: String): Boolean =
    fileSystem(spark, path).exists(new Path(path))

  /** A table written while empty has no partition directories (parquet writes
    * nothing for zero rows under partitionBy), so empties are written plain
    * with `_bucket` as a data column; this distinguishes the two layouts. */
  def isPartitioned(spark: SparkSession, path: String): Boolean = {
    val fs = fileSystem(spark, path)
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("_bucket="))
  }

  def deleteDir(spark: SparkSession, path: String): Unit =
    fileSystem(spark, path).delete(new Path(path), true)

  /** Tiny metadata marker (e.g. the bucket count a layout was written with). */
  def writeMarker(spark: SparkSession, path: String, value: String): Unit = {
    val out = fileSystem(spark, path).create(new Path(path), true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  def readMarker(spark: SparkSession, path: String): Option[String] = {
    val fs = fileSystem(spark, path)
    val p = new Path(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  /** Full bucketed write (empty-safe). `df` must not already carry `_bucket`.
    *
    * The partitioned write runs unconditionally — probing emptiness first
    * (`df.isEmpty`) would execute the whole upstream pipeline once for the
    * probe and again for the write, doubling every indexing save. A zero-row
    * partitioned write produces no partition directories (and no readable
    * footer), which is detected AFTER the fact and repaired with one empty
    * plain file carrying the schema (`_bucket` as an int data column). */
  def write(df: DataFrame, path: String, key: String, n: Int): Unit = {
    val spark = df.sparkSession
    if (!df.columns.contains(key))
      df.write.mode(SaveMode.Overwrite).parquet(path)
    else {
      df.withColumn("_bucket", bucketCol(col(key), n))
        .repartition(col("_bucket"))
        .sortWithinPartitions(col("_bucket"), col(key))
        .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(path)
      if (!isPartitioned(spark, path))
        // limit(0) collapses to an empty LocalRelation (OptimizeLimitZero) —
        // no upstream re-execution, just the schema in one empty file
        df.limit(0).withColumn("_bucket", lit(0))
          .write.mode(SaveMode.Overwrite).parquet(path)
    }
  }

  /** Read with the `_bucket` column present (as partition column or, for
    * empty-written tables, as a data column). Filter on `_bucket` BEFORE
    * dropping it to get partition pruning. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (df.columns.contains("_bucket")) df
    else df.withColumn("_bucket", lit(0)) // key-less plain layout
  }

  /** Partition-pruned read-modify-write: reads ONLY the given buckets, applies
    * `f`, and overwrites exactly those partition directories. `f`'s output keys
    * must hash into `buckets` — true by construction when callers derive
    * `buckets` from the very keys they touch or insert.
    *
    * A bucket whose rows all vanish is deleted explicitly: dynamic partition
    * overwrite only replaces partitions PRESENT in the new data, so an emptied
    * bucket would otherwise silently keep its old rows. */
  def rewriteBuckets(spark: SparkSession, path: String, key: String, n: Int,
      buckets: Seq[Int])(f: DataFrame => DataFrame): Unit = {
    if (buckets.isEmpty) return
    if (!isPartitioned(spark, path)) {
      // empty/legacy plain layout: the table is tiny by construction — full swap
      val cur = read(spark, path).drop("_bucket")
      write(f(cur).localCheckpoint(true), path, key, n)
      return
    }
    val affected = read(spark, path)
      .filter(col("_bucket").isin(buckets: _*)).drop("_bucket")
    // localCheckpoint (eager) breaks lineage on the files being overwritten —
    // the write must not depend on a scan of its own destination.
    val stamped = f(affected)
      .withColumn("_bucket", bucketCol(col(key), n))
      .repartition(col("_bucket"))
      .sortWithinPartitions(col("_bucket"), col(key))
      .localCheckpoint(true)
    stamped.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket").parquet(path)
    val present = stamped.select("_bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    buckets.filterNot(present).foreach(b => deleteDir(spark, s"$path/_bucket=$b"))
  }

  /** Bucket-pruned upsert: rows in `updates` replace same-key rows; only the
    * buckets containing update keys are rewritten. Creates the table on first
    * write. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame, key: String,
      n: Int): Unit = {
    if (!exists(spark, path)) {
      write(updates.localCheckpoint(true), path, key, n)
      return
    }
    val buckets = distinctBuckets(updates, key, n)
    rewriteBuckets(spark, path, key, n, buckets) { old =>
      old.join(updates.select(key), Seq(key), "left_anti")
        .unionByName(updates, allowMissingColumns = true)
    }
  }

  /** Files per bucket directory. Stays at ONE by construction: every bucket
    * rewrite ([[upsert]]/[[rewriteBuckets]]) replaces the whole partition
    * directory with freshly hash-partitioned output — one shuffle partition,
    * one sorted file per bucket — so the small-file degradation that
    * append-based incremental layouts need a compactor for cannot occur
    * here. (That IS the trade: writes pay a full-bucket rewrite, reads and
    * long-term health never pay fragmentation.) Tested as an invariant. */
  def fileCounts(spark: SparkSession, path: String): Map[Int, Int] = {
    val fs = fileSystem(spark, path)
    val p = new Path(path)
    if (!fs.exists(p)) Map.empty
    else fs.listStatus(p).toSeq
      .filter(_.getPath.getName.startsWith("_bucket="))
      .map { d =>
        d.getPath.getName.stripPrefix("_bucket=").toInt ->
          fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
  }
}
