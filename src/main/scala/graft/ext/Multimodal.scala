package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing ([EXT], SURVEY §2.10): image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct. The
  * Spark-side machinery — schema, partition sizing, per-partition
  * batched processing, feature schema — is real and tested; the codec
  * itself is a clearly marked STUB (this container ships no image/audio
  * libraries), producing deterministic fake features so the pipeline is
  * end-to-end verifiable.
  *
  * Scale notes: rows carry megabyte blobs, so the knobs that matter are
  * `spark.sql.files.maxPartitionBytes` (keep partitions ≲ a few hundred
  * MB of blob data) and `maxRecordsPerFile` on write. Feature extraction
  * is mapPartitions — one iterator pass, no shuffle; a real decoder
  * would amortize model/codec init per partition exactly where
  * `decodeInit` runs.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))), nullable = true)))

  /** Wrap any table into media rows (test harness: text bytes stand in
    * for encoded frames). Deterministic: meta derives from the payload.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("bytes"),
      struct(
        lit(s"application/x-fake-$kind").as("mime"),
        (length(col(payloadCol)) % 1920).cast("int").as("width"),
        (length(col(payloadCol)) % 1080).cast("int").as("height"),
        (length(col(payloadCol)) * 10L).cast("long").as("duration_ms")).as("meta"))

  /** Number of feature dimensions the stub decoder emits. */
  val FeatureDim = 8

  /** STUB decoder ???: a real implementation would decode the blob with
    * an image/audio codec and run a feature extractor. Deliberately
    * deterministic — features are byte-statistics of the payload — so
    * tests and oracles can verify the distributed plumbing end-to-end.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(FeatureDim)(0f)
    val buckets = new Array[Long](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      buckets(i % FeatureDim) += (bytes(i) & 0xff)
      i += 1
    }
    buckets.map(b => (b % 1000) / 1000f)
  }

  /** Per-partition init hook — where a real codec/model would be loaded
    * once per partition (NOT per row).
    */
  private def decodeInit(): Array[Byte] => Array[Float] = decodeStub

  /** Feature extraction over the binary column via mapPartitions:
    * batched iterator shape, init-per-partition, no shuffle. Output
    * appends `features array<float>`.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val ds: Dataset[Row] = media.mapPartitions { rows =>
      val decode = decodeInit() // once per partition
      rows.map { r =>
        val feats = decode(r.get(bytesIdx).asInstanceOf[Array[Byte]])
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
    ds.toDF()
  }

  /** Frame sampling for video-like blobs: emit one row per sampled
    * frame offset (every `frameMs` of the meta duration). The decode of
    * each frame is the same STUB; the explode/partitioning shape is the
    * real thing.
    */
  def sampleFrames(media: DataFrame, frameMs: Long = 1000L): DataFrame =
    media.filter(col("kind") === "video" || col("kind") === "image")
      .withColumn("frame_ms", explode(sequence(
        lit(0L), greatest(col("meta.duration_ms") - 1, lit(0L)), lit(frameMs))))
      .select(col("media_id"), col("frame_ms"), col("bytes"), col("meta"))
}
