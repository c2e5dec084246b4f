package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side contract is real and tested — schema, partition-level batch
  * shape, deterministic output layout; the actual byte decoding is STUBBED
  * (`fakeDecode`) because no media libraries exist in this container. A production
  * deployment swaps `fakeDecode` for a real decoder (or `mapInPandas`+PIL on the
  * Python side) without touching any of the plumbing.
  */
object Multimodal {

  /** Canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Wrap a text/“pretend payload” DataFrame into the asset schema (test fixture
    * path; real ingest reads `spark.read.format("binaryFile")`). */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("string").as("asset_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast("binary").as("payload"),
      lit(s"application/x-fake-$modality").as("mime"),
      map(lit("origin"), lit("synthetic")).as("meta"))

  // ======================== STUB: deterministic fake decode =====================
  // ??? in production: replace with a real decoder (JNI/ffmpeg/PIL-on-mapInPandas).
  // The fake derives "features" purely from the bytes so tests are deterministic.
  private def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null) return out
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.sqrt(out.map(x => x.toDouble * x).sum)
    if (n > 0) (0 until dim).foreach(j => out(j) = (out(j) / n).toFloat)
    out
  }

  /** Feature extraction over assets: per-partition batched "decode" → fixed-dim
    * feature vector + byte stats. Partition-level batching mirrors how a real
    * GPU/codec decoder would amortize setup cost; output schema is stable. */
  def extractFeatures(assets: DataFrame, dim: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", StringType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "modality", "payload").mapPartitions { it =>
      // batch shape: the iterator is consumed in groups so a real decoder could
      // submit one batch per device call
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getString(0), r.getString(1),
            if (payload == null) 0L else payload.length.toLong,
            fakeDecode(payload, dim).toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling shape for video: emit every `stride`-th "frame" (here: fixed-
    * size byte windows of the payload — the real impl swaps the window iterator
    * for a codec's frame iterator; partitioning/explode shape is identical). */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 256, stride: Int = 4): DataFrame = {
    assets
      .filter(col("modality") === "video")
      .select(col("asset_id"), col("payload"),
        posexplode(sequence(lit(0),
          greatest((length(col("payload")) / lit(frameBytes * stride)).cast("int") - 1,
            lit(0)))))
      .select(
        col("asset_id"),
        col("pos").cast("int").as("frame_index"),
        (col("col") * stride * frameBytes).cast("long").as("byte_offset"),
        col("payload").substr((col("col") * stride * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame_payload"))
  }
}
