package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodecs, MediaDecodeException, Multimodal}
import graft.operators.MediaCodecs.DecodedImage

/** Pure-JVM codec correctness: hand-assembled golden payloads with
  * hand-computed expected features, seeded round-trip loops, malformed-input
  * degradation, and the nearest-neighbor resize mapping.
  */
class MediaCodecsSpec extends AnyFunSuite {

  // ------------------------------------------------------------- golden WAV

  test("golden WAV: hand-built 44-byte header + 4 samples decodes exactly") {
    // samples 3, -4, 0, 5 at 8000 Hz: sumSq = 9+16+0+25 = 50
    val samples = Array[Short](3, -4, 0, 5)
    val bytes = MediaCodecs.encodeWav(8000, samples)
    assert(bytes.length == 44 + 8)
    // spot-check raw header bytes against the RIFF spec, not our own reader
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(bytes.slice(12, 16), "US-ASCII") == "fmt ")
    assert((bytes(22) & 0xff) == 1) // mono
    // sampleRate LE at offset 24
    assert((bytes(24) & 0xff) + ((bytes(25) & 0xff) << 8) == 8000)
    assert(new String(bytes.slice(36, 40), "US-ASCII") == "data")
    // first sample 3 as LE int16 at offset 44
    assert(bytes(44) == 3 && bytes(45) == 0)
    // -4 -> 0xFFFC
    assert((bytes(46) & 0xff) == 0xfc && (bytes(47) & 0xff) == 0xff)

    val info = MediaCodecs.decodeWav(bytes)
    assert(info.sampleRate == 8000)
    assert(info.nSamples == 4)
    assert(info.durationS == 4.0 / 8000)
    assert(info.rms == math.sqrt(50.0 / 4))
  }

  test("WAV decoder walks auxiliary chunks (LIST before data, odd-size padding)") {
    // RIFF with an odd-sized junk chunk between fmt and data must still parse
    val base = MediaCodecs.encodeWav(16000, Array[Short](100, -100))
    val fmtChunk = base.slice(12, 36) // "fmt " + size + 16 bytes
    val dataChunk = base.slice(36, base.length)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0) // size 3 + pad byte
    val payload = fmtChunk ++ junk ++ dataChunk
    val riff = java.nio.ByteBuffer.allocate(12 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(4 + payload.length)
      .put("WAVE".getBytes("US-ASCII")).put(payload)
    val info = MediaCodecs.decodeWav(riff.array())
    assert(info.sampleRate == 16000 && info.nSamples == 2)
    assert(info.rms == math.sqrt((100.0 * 100 + 100 * 100) / 2))
  }

  // ------------------------------------------------------------- golden BMP

  test("golden BMP: 2x2 image round-trips with bottom-up BGR rows and padding") {
    // logical top-down RGB: (255,0,0) (0,255,0) / (0,0,255) (10,20,30)
    val rgb = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30).map(_.toByte)
    val bytes = MediaCodecs.encodeBmp(2, 2, rgb)
    // rowSize = ((6+3)/4)*4 = 8; total = 54 + 2*8 = 70
    assert(bytes.length == 70)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    // bottom-up: file's first pixel row is the LOGICAL LAST row, BGR order →
    // (0,0,255) stored as B=255,G=0,R=0
    assert((bytes(54) & 0xff) == 255 && (bytes(55) & 0xff) == 0 && (bytes(56) & 0xff) == 0)
    val img = MediaCodecs.decodeImage(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == rgb.toSeq)
    assert(img.meanChannel(0) == (255.0 + 0 + 0 + 10) / 4)
    assert(img.meanChannel(1) == (0.0 + 255 + 0 + 20) / 4)
    assert(img.meanChannel(2) == (0.0 + 0 + 255 + 30) / 4)
  }

  test("BMP decoder handles top-down (negative height) DIB variants") {
    val rgb = Array.tabulate(2 * 2 * 3)(i => (i * 11).toByte)
    val bytes = MediaCodecs.encodeBmp(2, 2, rgb)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2) // negative height = top-down rows
    // flip the two stored rows so the logical image is unchanged
    val flipped = bytes.clone()
    System.arraycopy(bytes, 54, flipped, 62, 8)
    System.arraycopy(bytes, 62, flipped, 54, 8)
    val img = MediaCodecs.decodeImage(flipped)
    assert(img.rgb.toSeq == rgb.toSeq)
  }

  // ------------------------------------------------------------- golden PPM

  test("golden PPM: 2x1 P6 with a header comment decodes exactly") {
    val raster = Array[Byte](1, 2, 3, 4, 5, 6)
    val header = "P6\n# a comment line\n2 1\n255\n".getBytes("US-ASCII")
    val img = MediaCodecs.decodeImage(header ++ raster)
    assert(img.width == 2 && img.height == 1)
    assert(img.rgb.toSeq == raster.toSeq)
    // our encoder's canonical header matches ppmSize
    val enc = MediaCodecs.encodePpm(2, 1, raster)
    assert(enc.length == MediaCodecs.ppmSize(2, 1))
    assert(MediaCodecs.decodeImage(enc).rgb.toSeq == raster.toSeq)
  }

  // ------------------------------------------------------------- golden AVI

  test("golden AVI: 2-frame 2x2 clip round-trips header facts and frame pixels") {
    val f0 = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30).map(_.toByte)
    val f1 = f0.map(b => (b ^ 0x7f).toByte)
    val bytes = MediaCodecs.encodeAvi(2, 2, 40000, Array(f0, f1))
    // layout: 224 header bytes + 2 frames of (8 + 2 rows * 8-byte stride)
    assert(bytes.length == MediaCodecs.aviSize(2, 2, 2))
    assert(bytes.length == 224 + 2 * (8 + 16))
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
    val v = MediaCodecs.decodeAvi(bytes)
    assert(v.width == 2 && v.height == 2 && v.nFrames == 2 && v.usPerFrame == 40000)
    assert(v.durationS == (2L * 40000).toDouble / 1000000.0)
    assert(v.frame(0).rgb.toSeq == f0.toSeq)
    assert(v.frame(1).rgb.toSeq == f1.toSeq)
    assert(v.frame(0).meanChannel(0) == (255.0 + 0 + 0 + 10) / 4)
  }

  test("AVI decoder rejects malformed clips instead of garbage-decoding") {
    val ok = MediaCodecs.encodeAvi(2, 2, 40000, Array(new Array[Byte](12)))
    intercept[MediaDecodeException](MediaCodecs.decodeAvi(ok.slice(0, 100)))  // truncated movi
    val badBpp = ok.clone()
    // strf BITMAPINFOHEADER starts after RIFF(12) + LIST hdrl preamble(12) +
    // avih(64) + LIST strl preamble(12) + strh(64) + "strf"+size(8)
    java.nio.ByteBuffer.wrap(badBpp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(12 + 12 + 64 + 12 + 64 + 8 + 14, 16) // biBitCount = 16
    intercept[MediaDecodeException](MediaCodecs.decodeAvi(badBpp))
    val badCount = ok.clone()
    java.nio.ByteBuffer.wrap(badCount).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 12 + 8 + 16, 5) // avih totalFrames = 5, movi has 1
    intercept[MediaDecodeException](MediaCodecs.decodeAvi(badCount))
    intercept[MediaDecodeException](MediaCodecs.decodeAvi("RIFFxxxxWAVE".getBytes))
  }

  // -------------------------------------------------------- seeded round-trips

  test("seeded encode->decode round-trips preserve samples and pixels") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val rate = 4000 + rnd.nextInt(44100)
      val n = rnd.nextInt(300)
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val info = MediaCodecs.decodeWav(MediaCodecs.encodeWav(rate, samples))
      assert(info.sampleRate == rate && info.nSamples == n)
      var sumSq = 0L
      samples.foreach(s => sumSq += s.toLong * s)
      assert(info.rms == (if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)))

      val w = 1 + rnd.nextInt(20)
      val h = 1 + rnd.nextInt(20)
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val viaBmp = MediaCodecs.decodeImage(MediaCodecs.encodeBmp(w, h, rgb))
      val viaPpm = MediaCodecs.decodeImage(MediaCodecs.encodePpm(w, h, rgb))
      assert(viaBmp.width == w && viaBmp.height == h && viaBmp.rgb.toSeq == rgb.toSeq)
      assert(viaPpm.width == w && viaPpm.height == h && viaPpm.rgb.toSeq == rgb.toSeq)

      val nf = 1 + rnd.nextInt(6)
      val frames = Array.fill(nf)(Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
      val clip = MediaCodecs.decodeAvi(MediaCodecs.encodeAvi(w, h, 33333, frames))
      assert(clip.nFrames == nf && clip.width == w && clip.height == h)
      (0 until nf).foreach(i => assert(clip.frame(i).rgb.toSeq == frames(i).toSeq))
    }
  }

  // ------------------------------------------------------------- malformed

  test("malformed payloads throw MediaDecodeException, never garbage-decode") {
    val wav = MediaCodecs.encodeWav(8000, Array[Short](1, 2, 3))
    intercept[MediaDecodeException](MediaCodecs.decodeWav(wav.slice(0, 20)))        // truncated
    intercept[MediaDecodeException](MediaCodecs.decodeWav("RIFFxxxxNOPE".getBytes)) // not WAVE
    val badData = wav.clone()
    java.nio.ByteBuffer.wrap(badData).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 9999) // data chunk claims more bytes than exist
    intercept[MediaDecodeException](MediaCodecs.decodeWav(badData))

    val bmp = MediaCodecs.encodeBmp(2, 2, new Array[Byte](12))
    intercept[MediaDecodeException](MediaCodecs.decodeImage(bmp.slice(0, 30)))
    val bad16 = bmp.clone()
    java.nio.ByteBuffer.wrap(bad16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 16) // 16 bpp unsupported
    intercept[MediaDecodeException](MediaCodecs.decodeImage(bad16))

    intercept[MediaDecodeException](MediaCodecs.decodeImage("P6\n2 1\n65535\n??????".getBytes))
    intercept[MediaDecodeException](MediaCodecs.decodeImage("P6\n9 9\n255\nshort".getBytes))
    intercept[MediaDecodeException](MediaCodecs.decodeImage(Array[Byte](1, 2, 3)))
  }

  // --------------------------------------------------------------- resize

  test("nearest-neighbor resize maps (r,c) -> (r*h/H, c*w/W) with floor") {
    // 2x2 distinct pixels upscaled to 4x4: each source pixel becomes a 2x2 block
    val rgb = Array(10, 0, 0, 20, 0, 0, 30, 0, 0, 40, 0, 0).map(_.toByte)
    val out = MediaCodecs.resizeNearest(DecodedImage(2, 2, rgb), 4, 4)
    val reds = out.rgb.grouped(3).map(_(0).toInt).toSeq
    assert(reds == Seq(10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40))
    // downscale 4x4 -> 2x2 picks the top-left of each block
    val back = MediaCodecs.resizeNearest(out, 2, 2)
    assert(back.rgb.toSeq == rgb.toSeq)
  }
}

/** Spark-side multimodal integration over the real codecs. */
class MultimodalDecodeSpec extends SparkTestBase {
  import spark.implicits._

  test("extractFeatures decodes every synthesized payload for real, all three modalities") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val feats = Multimodal.extractFeatures(media).collect()
    val byModality = feats.groupBy(_.modality)
    assert(byModality("image").forall(f => f.decoded && f.width.nonEmpty && f.mean_b.nonEmpty))
    assert(byModality("audio").forall(f => f.decoded && f.sample_rate.nonEmpty && f.rms.nonEmpty))
    assert(byModality("video").forall(f =>
      f.decoded && f.width.nonEmpty && f.n_frames.nonEmpty && f.mean_b.nonEmpty && f.rms.isEmpty))
    // decoded facts must match the adapter's closed-form contract
    byModality("image").foreach { f =>
      assert(f.width.get == 4 + (f.media_id % 13).toInt)
      assert(f.height.get == 4 + (f.media_id % 7).toInt)
    }
    byModality("audio").foreach { f =>
      assert(f.sample_rate.get == 8000 + 4000 * (f.media_id % 4).toInt)
      assert(f.n_samples.get == 64 + (f.media_id % 97).toInt)
      assert(f.duration_s.get == f.n_samples.get.toDouble / f.sample_rate.get)
    }
    byModality("video").foreach { f =>
      assert(f.n_frames.get == 3 + (f.media_id % 7).toInt)
      assert(f.width.get == 4 + (f.media_id % 6).toInt)
      assert(f.height.get == 4 + (f.media_id % 5).toInt)
    }
  }

  test("sampleFrames seeks evenly spaced frames and decodes their real pixels") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val frames = Multimodal.sampleFrames(media, framesPerClip = 3).collect()
    assert(frames.nonEmpty && frames.length % 3 == 0)
    frames.foreach { r =>
      val id = r.getLong(0); val j = r.getInt(1); val src = r.getInt(2)
      val n = 3 + (id % 7).toInt
      assert(src == j * n / 3, s"frame mapping for doc $id idx $j")
      // recompute the frame-0-style closed-form mean for THIS frame
      val w = 4 + (id % 6).toInt; val h = 4 + (id % 5).toInt
      var sum = 0L
      (0 until w * h).foreach(p => sum += (id * 31 + src * 101L + (p * 3) * 17) % 256)
      assert(r.getDouble(3) == sum.toDouble / (w * h), s"mean_r of doc $id frame $src")
    }
  }

  test("a corrupted payload degrades to byte stats instead of failing the job") {
    val rows = Seq(
      (1L, "image", "BMgarbage-not-a-real-header-xxxxxxxxxxxxxxxxxxxxxxxxxxxx".getBytes("UTF-8")),
      (2L, "audio", MediaCodecs.encodeWav(8000, Array[Short](7, -7))),
      (3L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "modality", "payload")
    val feats = Multimodal.extractFeatures(rows).collect().sortBy(_.media_id)
    assert(!feats(0).decoded && feats(0).n_bytes > 0)  // bad magic-matched header
    assert(feats(1).decoded && feats(1).rms.contains(math.sqrt(49.0)))
    assert(!feats(2).decoded && feats(2).n_bytes == 0) // null payload
  }

  test("resizeImages re-encodes in the source container and stamps meta") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val resized = Multimodal.resizeImages(media, 8, 6)
    val images = resized.filter($"modality" === "image")
      .select($"media_id", $"payload", element_at($"meta", "resized_w").as("rw")).collect()
    assert(images.nonEmpty)
    images.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      assert(r.getString(2) == "8")
      val img = MediaCodecs.decodeImage(bytes)
      assert(img.width == 8 && img.height == 6)
      // container preserved: BMP for even doc_id/3, PPM otherwise
      if ((id / 3) % 2 == 0) assert(bytes(0) == 'B') else assert(bytes(0) == 'P')
    }
    // non-image rows pass through untouched (no resized_w stamp, same payload)
    val audio = resized.filter($"modality" === "audio")
      .select(element_at($"meta", "resized_w")).collect()
    assert(audio.forall(_.isNullAt(0)))
  }
}
