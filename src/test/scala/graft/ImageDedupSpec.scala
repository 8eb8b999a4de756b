package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, MediaCodecs, Multimodal}

/** Perceptual image near-dup: dHash construction against an independent
  * closed-form replay, the decode path end to end, and the EXACTNESS of the
  * banded hamming dedup (pigeonhole: banded candidates ⊇ the hamming ball)
  * against brute-force all-pairs.
  */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent dHash replay straight from the adapter's pixel closed form
    * (no MediaCodecs involved): the same arithmetic the DuckDB oracle runs.
    */
  private def dHashClosedForm(docId: Long): Long = {
    val w = (4 + docId % 13).toInt
    val h = (4 + docId % 7).toInt
    def gray(x: Int, y: Int): Long = {
      val sr = y * h / 8
      val sc = x * w / 9
      (0 until 3).map(ch => (docId * 31L + ((sr * w + sc) * 3 + ch) * 17L) % 256L).sum
    }
    var hash = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (gray(x + 1, y) > gray(x, y)) hash |= 1L << (y * 8 + x)
    hash
  }

  test("dHash64 of decoded synth images matches the pixel-closed-form replay") {
    // image doc_ids cover both containers (BMP: doc_id/3 even, PPM: odd)
    // and every (w, h) residue class
    val ids = (0L until 300L by 3L)
    ids.foreach { id =>
      val img = MediaCodecs.decodeImage(Multimodal.synthImage(id))
      assert(Multimodal.dHash64(img) == dHashClosedForm(id), s"doc_id=$id")
    }
  }

  test("imageDHash runs the real decode path and skips non-images and junk") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val got = Multimodal.imageDHash(media).as[(Long, Long)].collect().toMap
    val imageIds = media.filter(col("modality") === "image")
      .select("media_id").as[Long].collect().toSet
    assert(got.keySet == imageIds) // audio/video rows contribute nothing
    got.foreach { case (id, h) => assert(h == dHashClosedForm(id), s"doc_id=$id") }

    // a malformed payload degrades to no row, never an exception
    val broken = Seq((1L, "image", Array[Byte]('B', 'M', 1, 2))).toDF("media_id", "modality", "payload")
    assert(Multimodal.imageDHash(broken).count() == 0)
  }

  test("hammingDedup drops exactly the in-ball larger ids (hand-built fingerprints)") {
    // base, 2 bits flipped (in ball at maxHamming=2), 3 bits flipped (out),
    // and an unrelated far fingerprint
    val base = 0x0123456789abcdefL
    val in2 = base ^ (1L << 5) ^ (1L << 60)
    val out3 = base ^ (1L << 1) ^ (1L << 2) ^ (1L << 3)
    val far = ~base
    val df = Seq((1L, base), (2L, in2), (3L, out3), (4L, far)).toDF("id", "fp")
    val kept = Dedup.hammingDedup(df, "id", "fp", maxHamming = 2, bands = 8)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L)) // only the 2-bit variant collapses into 1
  }

  test("hammingDedup equals brute-force all-pairs on a pseudo-random corpus") {
    // LCG fingerprints with planted near-dups every 7th id: banding must
    // produce EXACTLY the all-pairs hamming result (zero false negatives by
    // pigeonhole, zero false positives by the exact verify)
    val fps = (0L until 400L).map { i =>
      val seed = i * 6364136223846793005L + 1442695040888963407L
      val fp = if (i % 7 == 3) {
        val prev = (i - 1) * 6364136223846793005L + 1442695040888963407L
        prev ^ (1L << (i % 64).toInt) // 1-bit variant of the previous id
      } else seed
      (i, fp)
    }
    val maxD = 3
    val expectedDrops = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= maxD
    } yield b).toSet
    val kept = Dedup.hammingDedup(fps.toDF("id", "fp"), "id", "fp",
      maxHamming = maxD, bands = 8)
      .select("id").as[Long].collect().toSet
    assert(kept == fps.map(_._1).toSet -- expectedDrops)
    assert(expectedDrops.nonEmpty) // the planted variants actually planted
  }

  test("audioFingerprint64 matches the sample-closed-form replay through the real decode") {
    def closedForm(docId: Long): Long = {
      val n = (64 + docId % 97).toInt
      def energy(w: Int): Long =
        (w * n / 65 until (w + 1) * n / 65).map { i =>
          val s = (docId * 7919L + i * 104729L) % 4001L - 2000L
          s * s
        }.sum
      var hash = 0L
      for (j <- 0 until 64) if (energy(j + 1) > energy(j)) hash |= 1L << j
      hash
    }
    (1L until 300L by 3L).foreach { id => // doc_id % 3 == 1: the audio docs
      val (_, samples) = MediaCodecs.decodeWavSamples(Multimodal.synthAudio(id))
      assert(Multimodal.audioFingerprint64(samples) == closedForm(id), s"doc_id=$id")
    }

    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val got = Multimodal.audioFingerprints(media).as[(Long, Long)].collect().toMap
    val audioIds = media.filter(col("modality") === "audio")
      .select("media_id").as[Long].collect().toSet
    assert(got.keySet == audioIds)
    got.foreach { case (id, h) => assert(h == closedForm(id), s"doc_id=$id") }
    // junk degrades to no row, never an exception
    val broken = Seq((1L, "audio", Array[Byte]('R', 'I', 'F', 'F', 9)))
      .toDF("media_id", "modality", "payload")
    assert(Multimodal.audioFingerprints(broken).count() == 0)
  }

  test("videoFingerprint64 is the per-bit majority of the sampled frames' dHashes") {
    (2L until 300L by 3L).foreach { id => // doc_id % 3 == 2: the video docs
      val v = MediaCodecs.decodeAvi(Multimodal.synthVideo(id))
      val frameHashes = (0 until 3).map(j => Multimodal.dHash64(v.frame(j * v.nFrames / 3)))
      val expected = (0 until 64).foldLeft(0L) { (acc, bit) =>
        if (frameHashes.count(h => ((h >>> bit) & 1L) == 1L) >= 2) acc | (1L << bit) else acc
      }
      assert(Multimodal.videoFingerprint64(v) == expected, s"doc_id=$id")
    }
    // end-to-end through the media frame: only video rows, junk skipped
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val got = Multimodal.videoFingerprints(media).as[(Long, Long)].collect().toMap
    val videoIds = media.filter(col("modality") === "video")
      .select("media_id").as[Long].collect().toSet
    assert(got.keySet == videoIds)
    val broken = Seq((1L, "video", Array[Byte]('R', 'I', 'F', 'F')))
      .toDF("media_id", "modality", "payload")
    assert(Multimodal.videoFingerprints(broken).count() == 0)
  }

  test("degenerate media: 1x1 images and 0-sample WAVs fingerprint to flat hashes") {
    // 1×1 image: every 9×8 resample cell is the same pixel → zero gradient
    // everywhere → dHash 0 (not a crash, not a partial hash)
    val one = MediaCodecs.DecodedImage(1, 1, Array[Byte](10, 20, 30))
    assert(Multimodal.dHash64(one) == 0L)
    // 0-sample WAV: every energy window is empty (0) → fingerprint 0
    assert(Multimodal.audioFingerprint64(Array.emptyShortArray) == 0L)
    val silent = MediaCodecs.encodeWav(8000, Array.emptyShortArray)
    val (_, decoded) = MediaCodecs.decodeWavSamples(silent)
    assert(decoded.isEmpty && Multimodal.audioFingerprint64(decoded) == 0L)
    // flat-hash floods meet the hammingDedup contract, not a quadratic
    // surprise: identical zero hashes collapse to the min id
    val flat = (0L until 100L).map((_, 0L)).toDF("id", "fp")
    val kept = Dedup.hammingDedup(flat, "id", "fp", maxHamming = 2, bands = 8)
      .select("id").as[Long].collect().toSeq
    assert(kept == Seq(0L))
  }

  test("hammingDedup rejects configurations that break the pigeonhole guarantee") {
    val df = Seq((1L, 0L)).toDF("id", "fp")
    intercept[IllegalArgumentException] {
      Dedup.hammingDedup(df, "id", "fp", maxHamming = 8, bands = 8) // d >= bands
    }
    intercept[IllegalArgumentException] {
      Dedup.hammingDedup(df, "id", "fp", maxHamming = 2, bands = 7) // 7 ∤ 64
    }
  }
}
