package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * per-partition batch transforms (`mapPartitions` over an explicit Encoder —
  * the Scala analog of `mapInPandas` batch UDFs).
  *
  * The decode kernels are REAL pure-JVM codecs ([[MediaCodecs]]): RIFF/WAVE
  * PCM audio and BMP/PPM images are parsed from their actual container bytes
  * (header walk, pixel/sample extraction), features are computed from decoded
  * samples/pixels, and image resize decodes → resamples → re-encodes. Only
  * video remains an opaque-payload stub (no pure-JVM container format exists
  * for it); its rows degrade to byte-level stats, clearly flagged by
  * `decoded = false`.
  */
object Multimodal {

  /** The canonical multimodal record contract. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** One row per media item: byte-level stats for every payload, plus
    * modality-specific decoded features (None where the payload is not a
    * container this engine decodes, or fails to parse — `decoded` tells the
    * two apart from a genuine all-zero signal).
    */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      byte_entropy: Double,
      content_hash: Long,
      decoded: Boolean,
      sample_rate: Option[Int],
      n_samples: Option[Int],
      duration_s: Option[Double],
      rms: Option[Double],
      width: Option[Int],
      height: Option[Int],
      mean_r: Option[Double],
      mean_g: Option[Double],
      mean_b: Option[Double])

  /** Byte-level stats every payload gets regardless of container:
    * (size, byte-histogram entropy, FNV-1a content hash).
    */
  private def byteStats(bytes: Array[Byte]): (Int, Double, Long) = {
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
    (bytes.length, entropy, h)
  }

  /** Decode one payload: sniff the container by magic bytes (mime may lie),
    * parse for real, degrade to byte-stats-only on unknown/malformed input.
    */
  private[operators] def decodeOne(mediaId: Long, modality: String, payload: Array[Byte]): MediaFeatures = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val (nBytes, entropy, hash) = byteStats(bytes)
    val base = MediaFeatures(mediaId, modality, nBytes, entropy, hash, decoded = false,
      None, None, None, None, None, None, None, None, None)
    try {
      if (MediaCodecs.looksLikeWav(bytes)) {
        val w = MediaCodecs.decodeWav(bytes)
        base.copy(decoded = true, sample_rate = Some(w.sampleRate), n_samples = Some(w.nSamples),
          duration_s = Some(w.durationS), rms = Some(w.rms))
      } else if (MediaCodecs.looksLikeImage(bytes)) {
        val img = MediaCodecs.decodeImage(bytes)
        base.copy(decoded = true, width = Some(img.width), height = Some(img.height),
          mean_r = Some(img.meanChannel(0)), mean_g = Some(img.meanChannel(1)),
          mean_b = Some(img.meanChannel(2)))
      } else base
    } catch {
      case _: MediaDecodeException => base // malformed container: keep byte stats
    }
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
      .mapPartitions { it => it.map { case (id, mod, payload) => decodeOne(id, mod, payload) } }
  }

  /** Real image resize: decode (BMP or PPM), nearest-neighbor resample to
    * `width`×`height`, re-encode in the SAME container, and stamp the new
    * dims into `meta`. Non-image payloads (and malformed images) pass through
    * unchanged — resize is not the place to fail a 100 TB pipeline on one bad
    * file; downstream `extractFeatures.decoded` surfaces them.
    */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    val resizeKernel = udf { (payload: Array[Byte]) =>
      if (!MediaCodecs.looksLikeImage(payload)) payload
      else try {
        val img = MediaCodecs.decodeImage(payload)
        val out = MediaCodecs.resizeNearest(img, width, height)
        if (payload(0) == 'B') MediaCodecs.encodeBmp(out.width, out.height, out.rgb)
        else MediaCodecs.encodePpm(out.width, out.height, out.rgb)
      } catch { case _: MediaDecodeException => payload }
    }
    val isImage = col("payload").isNotNull &&
      (substring(col("payload"), 1, 2) === lit("BM".getBytes("US-ASCII")) ||
        substring(col("payload"), 1, 2) === lit("P6".getBytes("US-ASCII")))
    media
      .withColumn("payload", when(isImage, resizeKernel(col("payload"))).otherwise(col("payload")))
      .withColumn("meta",
        when(isImage,
          map_concat(
            coalesce(col("meta"), map()),
            map(lit("resized_w"), lit(width.toString), lit("resized_h"), lit(height.toString))))
          .otherwise(col("meta")))
  }

  /** STUB video frame sampling: emits `framesPerClip` synthetic frame rows
    * per video row (1->N generator via posexplode) with deterministic frame
    * offsets — a real kernel would seek+decode frames per partition (no
    * pure-JVM video container to parse; documented stub).
    */
  def sampleFrames(media: DataFrame, framesPerClip: Int): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"), posexplode(
        transform(sequence(lit(0), lit(framesPerClip - 1)),
          i => xxhash64(col("media_id"), i))))
      .withColumnsRenamed(Map("pos" -> "frame_idx", "col" -> "frame_hash"))

  // ------------------------------------------------------------------------
  // Test-data adapter: REAL container payloads, closed-form from doc_id.
  //
  // The parameters below are the contract the DuckDB oracle mirrors
  // arithmetically (SparkEntry."multimodal_features"/"resize_meta"): every
  // constant here appears verbatim in the oracle SQL, so a decoder bug breaks
  // the hash gate.
  //
  //   modality  = doc_id % 3        (0=image, 1=audio, 2=video)
  //   audio     : rate = 8000 + 4000*(doc_id % 4); n = 64 + doc_id % 97
  //               sample(i) = (doc_id*7919 + i*104729) % 4001 - 2000
  //   image     : container = BMP if (doc_id/3) even else PPM
  //               w = 4 + doc_id % 13; h = 4 + doc_id % 7
  //               rgb(k) = (doc_id*31 + k*17) % 256,  k = (row*w + col)*3 + ch
  //   video     : UTF-8 text bytes, opaque (no pure-JVM video container)
  // ------------------------------------------------------------------------

  private[operators] def synthAudio(docId: Long): Array[Byte] = {
    val rate = (8000 + 4000 * (docId % 4)).toInt
    val n = (64 + docId % 97).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((docId * 7919L + i * 104729L) % 4001L - 2000L).toShort
      i += 1
    }
    MediaCodecs.encodeWav(rate, samples)
  }

  private[operators] def synthImage(docId: Long): Array[Byte] = {
    val w = (4 + docId % 13).toInt
    val h = (4 + docId % 7).toInt
    val rgb = new Array[Byte](w * h * 3)
    var k = 0
    while (k < rgb.length) {
      rgb(k) = ((docId * 31L + k * 17L) % 256L).toByte
      k += 1
    }
    if ((docId / 3) % 2 == 0) MediaCodecs.encodeBmp(w, h, rgb)
    else MediaCodecs.encodePpm(w, h, rgb)
  }

  /** Fabricates a media table from the documents table: images and audio get
    * REAL encoded BMP/PPM/WAV payloads (deterministic in doc_id, see contract
    * above); video rides the raw text bytes as an opaque clip stand-in.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "lang", "text")
      .as[(Long, String, String, String)]
    docs.map { case (docId, source, lang, text) =>
      val modality = (docId % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val payload: Array[Byte] = modality match {
        case "image" => synthImage(docId)
        case "audio" => synthAudio(docId)
        case _ => if (text == null) null else text.getBytes("UTF-8")
      }
      val mime = modality match {
        case "image" => if ((docId / 3) % 2 == 0) "image/bmp" else "image/x-portable-pixmap"
        case "audio" => "audio/wav"
        case _ => "application/octet-stream"
      }
      (docId, modality, payload, mime, Map("source" -> source, "lang" -> lang))
    }.toDF("media_id", "modality", "payload", "mime", "meta")
  }
}
