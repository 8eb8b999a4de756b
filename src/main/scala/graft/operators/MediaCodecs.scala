package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM media codecs for the multimodal column path — no external
  * libraries, just the public container formats:
  *
  *   - WAV  : RIFF/WAVE with a PCM `fmt ` chunk + `data` chunk (16-bit mono).
  *   - BMP  : BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40), 24 bpp,
  *            uncompressed, bottom-up rows in BGR order padded to 4 bytes.
  *   - PPM  : P6 binary — ASCII header (`P6`, width, height, maxval) with
  *            `#` comments allowed, then packed RGB triplets.
  *
  * Decoders do real header parsing (chunk walk for RIFF, DIB field reads for
  * BMP, whitespace/comment tokenizer for PPM) and throw
  * [[MediaDecodeException]] on malformed input; [[Multimodal.extractFeatures]]
  * degrades such rows to byte-level stats instead of failing the job.
  *
  * Numeric contract (relied on by the DuckDB oracle mirrors in SparkEntry):
  * per-channel sums and sample-square sums accumulate in Long (exact), and
  * only the final mean/RMS divide + sqrt run in double — both IEEE-exact, so
  * decoded features compare hash-identical across engines.
  */
final class MediaDecodeException(msg: String) extends RuntimeException(msg)

object MediaCodecs {

  /** Decoded audio: canonical stats over the PCM samples. */
  final case class WavInfo(sampleRate: Int, nSamples: Int, durationS: Double, rms: Double)

  /** Decoded image: top-down, row-major RGB triplets regardless of container. */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3, s"pixel buffer ${rgb.length} != ${width}x$height x3")
    /** Exact per-channel mean: Long sum of unsigned bytes, one double divide. */
    def meanChannel(c: Int): Double = {
      var sum = 0L
      var p = 0
      val n = width * height
      while (p < n) { sum += rgb(p * 3 + c) & 0xff; p += 1 }
      sum.toDouble / n
    }
  }

  // ---------------------------------------------------------------- WAV ----

  /** 16-bit mono PCM → RIFF/WAVE bytes (44-byte canonical header). */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate $sampleRate")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataSize) // riff payload size
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16)            // PCM fmt chunk size
    buf.putShort(1)           // audioFormat = PCM
    buf.putShort(1)           // channels = mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byteRate = rate * channels * 2
    buf.putShort(2)           // blockAlign
    buf.putShort(16)          // bitsPerSample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Walks RIFF chunks (even-padded per spec), reads `fmt ` + `data`, and
    * computes duration/RMS over the 16-bit LE mono samples.
    */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    val (sampleRate, samples) = decodeWavSamples(bytes)
    val n = samples.length
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = samples(i).toLong
      sumSq += s * s
      i += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
    WavInfo(sampleRate, n, n.toDouble / sampleRate, rms)
  }

  /** The raw decode underneath [[decodeWav]]: (sampleRate, PCM samples).
    * Fingerprinting and any sample-level transform need the waveform, not
    * just the canonical stats.
    */
  def decodeWavSamples(bytes: Array[Byte]): (Int, Array[Short]) = {
    if (bytes == null || bytes.length < 12) fail("wav: truncated RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (ascii(bytes, 0) != "RIFF" || ascii(bytes, 8) != "WAVE") fail("wav: not RIFF/WAVE")
    var pos = 12
    var sampleRate = -1
    var bitsPerSample = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = ascii(bytes, pos)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) fail(s"wav: chunk '$id' overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail("wav: fmt chunk too short")
          val audioFormat = buf.getShort(pos + 8) & 0xffff
          if (audioFormat != 1) fail(s"wav: unsupported non-PCM format $audioFormat")
          channels = buf.getShort(pos + 10) & 0xffff
          sampleRate = buf.getInt(pos + 12)
          bitsPerSample = buf.getShort(pos + 22) & 0xffff
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => () // skip auxiliary chunks (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // RIFF chunks are even-padded
    }
    if (sampleRate <= 0 || dataOff < 0) fail("wav: missing fmt or data chunk")
    if (channels != 1 || bitsPerSample != 16)
      fail(s"wav: only 16-bit mono supported (got $channels ch / $bitsPerSample bit)")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = buf.getShort(dataOff + i * 2)
      i += 1
    }
    (sampleRate, samples)
  }

  // ---------------------------------------------------------------- BMP ----

  /** Padded bytes per BMP row at 24 bpp. */
  def bmpRowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Total encoded BMP size (14 + 40 byte headers + padded pixel rows). */
  def bmpSize(width: Int, height: Int): Int = 54 + height * bmpRowSize(width)

  /** Top-down RGB triplets → 24 bpp uncompressed BMP (bottom-up BGR rows). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb buffer size mismatch")
    val rowSize = bmpRowSize(width)
    val total = bmpSize(width, height)
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(total)
    buf.putInt(0)      // reserved
    buf.putInt(54)     // pixel data offset
    buf.putInt(40)     // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height) // positive = bottom-up
    buf.putShort(1)    // planes
    buf.putShort(24)   // bpp
    buf.putInt(0)      // BI_RGB (uncompressed)
    buf.putInt(height * rowSize)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0)       // palette
    var row = height - 1          // bottom-up: last logical row first
    while (row >= 0) {
      val base = 54 + (height - 1 - row) * rowSize
      var colPos = base
      var c = 0
      while (c < width) {
        val p = (row * width + c) * 3
        buf.put(colPos, rgb(p + 2))     // B
        buf.put(colPos + 1, rgb(p + 1)) // G
        buf.put(colPos + 2, rgb(p))     // R
        colPos += 3
        c += 1
      }
      row -= 1
    }
    buf.array()
  }

  private def decodeBmp(bytes: Array[Byte]): DecodedImage = {
    if (bytes.length < 54) fail("bmp: truncated header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    if (width <= 0 || rawHeight == 0) fail(s"bmp: bad dims ${width}x$rawHeight")
    if (bpp != 24 || compression != 0) fail(s"bmp: only 24 bpp uncompressed ($bpp/$compression)")
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    val rowSize = bmpRowSize(width)
    if (dataOff < 54 || dataOff.toLong + height.toLong * rowSize > bytes.length)
      fail("bmp: pixel data overruns payload")
    val rgb = new Array[Byte](width * height * 3)
    var srcRow = 0
    while (srcRow < height) {
      val logicalRow = if (bottomUp) height - 1 - srcRow else srcRow
      val base = dataOff + srcRow * rowSize
      var c = 0
      while (c < width) {
        val p = (logicalRow * width + c) * 3
        rgb(p) = bytes(base + c * 3 + 2)     // R
        rgb(p + 1) = bytes(base + c * 3 + 1) // G
        rgb(p + 2) = bytes(base + c * 3)     // B
        c += 1
      }
      srcRow += 1
    }
    DecodedImage(width, height, rgb)
  }

  // ---------------------------------------------------------------- PPM ----

  /** Encoded P6 size: "P6\n{w} {h}\n255\n" header + packed RGB. */
  def ppmSize(width: Int, height: Int): Int =
    9 + width.toString.length + height.toString.length + 3 * width * height

  /** Top-down RGB triplets → binary P6 PPM. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb buffer size mismatch")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  private def decodePpm(bytes: Array[Byte]): DecodedImage = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("ppm: not P6")
    var pos = 2
    // P6 header tokens separated by whitespace; '#' starts a comment to EOL
    def nextInt(): Int = {
      var inComment = false
      while (pos < bytes.length &&
        (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      val start = pos
      while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
      if (pos == start) fail("ppm: malformed header token")
      new String(bytes, start, pos - start, StandardCharsets.US_ASCII).toInt
    }
    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    if (width <= 0 || height <= 0) fail(s"ppm: bad dims ${width}x$height")
    if (maxval != 255) fail(s"ppm: only maxval 255 supported (got $maxval)")
    pos += 1 // exactly one whitespace byte after maxval precedes the raster
    val n = width * height * 3
    if (pos + n > bytes.length) fail("ppm: raster overruns payload")
    val rgb = new Array[Byte](n)
    System.arraycopy(bytes, pos, rgb, 0, n)
    DecodedImage(width, height, rgb)
  }

  // ---------------------------------------------------------------- AVI ----

  /** Decoded AVI clip: header facts plus lazily-decoded frames (the pixel
    * data stays in the payload buffer until a frame is asked for — sampling
    * 3 frames of a 1000-frame clip decodes 3, not 1000).
    */
  final case class DecodedVideo(
      width: Int, height: Int, nFrames: Int, usPerFrame: Int,
      private val frameOffsets: Vector[Int], private val bytes: Array[Byte]) {
    /** Exact in both engines: integer product, one double divide. */
    def durationS: Double = (nFrames.toLong * usPerFrame).toDouble / 1000000.0
    def frame(i: Int): DecodedImage = {
      require(i >= 0 && i < nFrames, s"frame $i of $nFrames")
      DecodedImage(width, height, unpackDib(bytes, frameOffsets(i), width, height))
    }
  }

  /** Fixed header overhead of the canonical AVI layout this codec writes:
    * 12 (RIFF) + 200 (LIST hdrl: avih 64 + LIST strl [strh 64 + strf 48])
    * + 12 (LIST movi preamble); each frame adds 8 + h*rowSize(w).
    */
  def aviSize(width: Int, height: Int, nFrames: Int): Int =
    224 + nFrames * (8 + height * bmpRowSize(width))

  /** Top-down RGB frames → RIFF/AVI with uncompressed `00db` DIB frames
    * (bottom-up BGR rows, 4-byte padded — the same pixel convention as BMP).
    */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    require(usPerFrame > 0 && frames.nonEmpty, "need a frame rate and at least one frame")
    frames.foreach(f => require(f.length == width * height * 3, "frame buffer size mismatch"))
    val rowSize = bmpRowSize(width)
    val frameSize = height * rowSize
    val total = aviSize(width, height, frames.length)
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes(StandardCharsets.US_ASCII))
    fourcc("RIFF"); buf.putInt(total - 8); fourcc("AVI ")
    // LIST hdrl
    fourcc("LIST"); buf.putInt(4 + 64 + 124); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
    buf.putInt(frames.length).putInt(0).putInt(1).putInt(frameSize)
    buf.putInt(width).putInt(height)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    // LIST strl
    fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putShort(0).putShort(0).putInt(0)
    buf.putInt(usPerFrame)  // scale
    buf.putInt(1000000)     // rate: frames/sec = rate/scale
    buf.putInt(0).putInt(frames.length).putInt(frameSize).putInt(-1).putInt(0)
    buf.putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort) // rcFrame
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)
    buf.putInt(0) // BI_RGB
    buf.putInt(frameSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    // LIST movi
    fourcc("LIST"); buf.putInt(4 + frames.length * (8 + frameSize)); fourcc("movi")
    frames.foreach { rgb =>
      fourcc("00db"); buf.putInt(frameSize)
      packDibInto(buf, width, height, rgb)
    }
    buf.array()
  }

  def looksLikeAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && ascii(bytes, 0) == "RIFF" && ascii(bytes, 8) == "AVI "

  /** Real container parse: walk RIFF LISTs, read `avih` (frame period, count,
    * dims), validate `strf` is 24 bpp uncompressed, index the `movi` frame
    * chunks. Frame pixels decode lazily via [[DecodedVideo.frame]].
    */
  def decodeAvi(bytes: Array[Byte]): DecodedVideo = {
    if (!looksLikeAvi(bytes)) fail("avi: not RIFF/AVI")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var usPerFrame = -1; var nFrames = -1; var width = -1; var height = -1
    var bppOk = false
    var frameOffsets = Vector.newBuilder[Int]
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = ascii(bytes, pos)
        val size = buf.getInt(pos + 4)
        if (size < 0 || pos + 8 + size > end) fail(s"avi: chunk '$id' overruns payload")
        id match {
          case "LIST" =>
            if (size < 4) fail("avi: truncated LIST")
            walk(pos + 12, pos + 8 + size) // recurse past the list type fourcc
          case "avih" =>
            if (size < 40) fail("avi: avih too short")
            usPerFrame = buf.getInt(pos + 8)
            nFrames = buf.getInt(pos + 24)
            width = buf.getInt(pos + 40)
            height = buf.getInt(pos + 44)
          case "strf" =>
            if (size >= 20) {
              val bpp = buf.getShort(pos + 8 + 14) & 0xffff
              val compression = buf.getInt(pos + 8 + 16)
              if (bpp != 24 || compression != 0) fail(s"avi: only 24 bpp uncompressed ($bpp/$compression)")
              bppOk = true
            }
          case "00db" | "00dc" => frameOffsets += pos + 8
          case _ => () // strh, idx1, JUNK, ...
        }
        pos += 8 + size + (size & 1) // RIFF chunks are even-padded
      }
    }
    walk(12, bytes.length)
    val offsets = frameOffsets.result()
    if (usPerFrame <= 0 || width <= 0 || height <= 0) fail("avi: missing or bad avih header")
    if (!bppOk) fail("avi: missing strf format chunk")
    if (offsets.isEmpty) fail("avi: no movi frame chunks")
    if (nFrames != offsets.length) fail(s"avi: header claims $nFrames frames, movi has ${offsets.length}")
    offsets.foreach { off =>
      if (off + height * bmpRowSize(width) > bytes.length) fail("avi: frame overruns payload")
    }
    DecodedVideo(width, height, offsets.length, usPerFrame, offsets, bytes)
  }

  // ------------------------------------------------- DIB pixel packing ----
  // Shared convention for BMP pixel arrays and AVI 00db frames: bottom-up
  // rows, BGR byte order, rows padded to 4 bytes.

  private def packDibInto(buf: ByteBuffer, width: Int, height: Int, rgb: Array[Byte]): Unit = {
    val rowSize = bmpRowSize(width)
    val base = buf.position()
    var row = height - 1
    while (row >= 0) {
      val rowBase = base + (height - 1 - row) * rowSize
      var c = 0
      while (c < width) {
        val p = (row * width + c) * 3
        buf.put(rowBase + c * 3, rgb(p + 2))
        buf.put(rowBase + c * 3 + 1, rgb(p + 1))
        buf.put(rowBase + c * 3 + 2, rgb(p))
        c += 1
      }
      row -= 1
    }
    buf.position(base + height * rowSize)
  }

  private def unpackDib(bytes: Array[Byte], off: Int, width: Int, height: Int): Array[Byte] = {
    val rowSize = bmpRowSize(width)
    val rgb = new Array[Byte](width * height * 3)
    var srcRow = 0
    while (srcRow < height) {
      val logicalRow = height - 1 - srcRow
      val base = off + srcRow * rowSize
      var c = 0
      while (c < width) {
        val p = (logicalRow * width + c) * 3
        rgb(p) = bytes(base + c * 3 + 2)
        rgb(p + 1) = bytes(base + c * 3 + 1)
        rgb(p + 2) = bytes(base + c * 3)
        c += 1
      }
      srcRow += 1
    }
    rgb
  }

  // ----------------------------------------------------------- dispatch ----

  /** Container sniffing by magic bytes — the real-world contract (mime/meta
    * may lie; the payload doesn't).
    */
  def decodeImage(bytes: Array[Byte]): DecodedImage = {
    if (bytes == null || bytes.length < 2) fail("image: empty payload")
    if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else fail("image: unknown container magic")
  }

  def looksLikeWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && ascii(bytes, 0) == "RIFF" && ascii(bytes, 8) == "WAVE"

  def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 2 &&
      ((bytes(0) == 'B' && bytes(1) == 'M') || (bytes(0) == 'P' && bytes(1) == '6'))

  // ------------------------------------------------------------- resize ----

  /** Nearest-neighbor resample: source pixel for output (r, c) is
    * (r*h/H, c*w/W) with integer floor division — the mapping the oracle
    * mirrors closed-form.
    */
  def resizeNearest(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    require(outW > 0 && outH > 0, s"resize dims ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var r = 0
    while (r < outH) {
      val sr = r * img.height / outH
      var c = 0
      while (c < outW) {
        val sc = c * img.width / outW
        val src = (sr * img.width + sc) * 3
        val dst = (r * outW + c) * 3
        out(dst) = img.rgb(src)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        c += 1
      }
      r += 1
    }
    DecodedImage(outW, outH, out)
  }

  private def ascii(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, StandardCharsets.US_ASCII)

  private def fail(msg: String): Nothing = throw new MediaDecodeException(msg)
}
