package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * per-partition batch transforms (`mapPartitions` over an explicit Encoder —
  * the Scala analog of `mapInPandas` batch UDFs).
  *
  * The actual media codecs are NOT in this container, so the decode kernels
  * below are clearly-marked deterministic STUBS; everything around them —
  * schema contract, partition-batched execution, binary hygiene (payload
  * never shuffled wider than needed), output shapes — is real and tested.
  * Swapping a stub for a JNI/FFI codec changes one function body.
  */
object Multimodal {

  /** The canonical multimodal record contract. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      byte_entropy: Double,
      content_hash: Long)

  /** STUB decode kernel: a real implementation would hand `payload` to an
    * image/audio decoder. Here it derives deterministic pseudo-features
    * (size, byte-histogram entropy, content hash) so the pipeline shape,
    * batching and outputs are exercised end-to-end.
    */
  private def stubDecode(mediaId: Long, modality: String, payload: Array[Byte]): MediaFeatures = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val hist = new Array[Long](256)
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) {
      hist(bytes(i) & 0xff) += 1
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    val n = bytes.length.toDouble
    var entropy = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) { val p = hist(j) / n; entropy -= p * math.log(p) / math.log(2.0) }
      j += 1
    }
    MediaFeatures(mediaId, modality, bytes.length, entropy, h)
  }

  /** Feature extraction over a media frame: partition-batched, binary stays
    * columnar until the partition iterator, output is a narrow typed frame
    * (the wide payload column is dropped before any shuffle).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it => it.map { case (id, mod, payload) => stubDecode(id, mod, payload) } }
  }

  /** STUB image resize: passes metadata through and stamps target dims —
    * the real kernel would decode, resample, re-encode inside the same
    * mapPartitions batch.
    */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("meta",
      map_concat(
        coalesce(col("meta"), map()),
        map(lit("resized_w"), lit(width.toString), lit("resized_h"), lit(height.toString))))

  /** STUB video frame sampling: emits `framesPerClip` synthetic frame rows
    * per video row (1->N generator via posexplode) with deterministic frame
    * offsets — the real kernel would seek+decode frames per partition.
    */
  def sampleFrames(media: DataFrame, framesPerClip: Int): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"), posexplode(
        transform(sequence(lit(0), lit(framesPerClip - 1)),
          i => xxhash64(col("media_id"), i))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame_hash"))

  /** Adapter used by tests/queries: fabricates a media table from the
    * documents table (text bytes as the opaque payload) so the multimodal
    * path has real data to flow.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("modality"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
  }
}
