package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal pipeline: uncompressed
  * 24-bit BMP and 16-bit PCM WAV parsed from first principles, plus
  * compressed PNG/JPEG through the JDK's own `javax.imageio` (in
  * every JRE, zero external dependencies) — real byte-level decode
  * replacing the hash-derived [[MultimodalOps.decodeStub]]
  * pseudo-features with actual pixel and sample values. The reference
  * has no media layer at all; this is part of the mandated
  * training-data-pipeline surface (multimodal binary columns with a
  * real decode seam).
  *
  * A production deployment swaps in richer codecs (video containers,
  * FLAC, …) behind the same [[Decoded]] row shape. All functions are
  * total: malformed bytes decode to `format = "unknown"` instead of
  * throwing, so one corrupt asset cannot kill a 100 TB decode stage
  * (row-group-granularity error isolation, same philosophy as the
  * reference's per-place try/except at extraction.py:160-165).
  */
object MediaCodecs {

  /** Unified decode result across media kinds; unused fields are
    * None (image fields for a WAV, audio fields for a BMP). */
  final case class Decoded(
      format: String,
      width: Option[Int], height: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double], mean_b: Option[Double],
      sample_rate: Option[Int], n_samples: Option[Long],
      duration_ms: Option[Long], mean_sample: Option[Double])

  private val Unknown = Decoded("unknown", None, None, None, None, None,
    None, None, None, None)

  // ------------------------------------------------------------------
  // BMP (Windows BITMAPINFOHEADER, 24 bpp, uncompressed, bottom-up)
  // ------------------------------------------------------------------

  /** Row stride padded to a 4-byte boundary per the BMP spec. */
  private def bmpStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode a solid-color 24-bit BMP. Exercised by tests and the
    * round-trip oracle query (constant color → exact mean). */
  def encodeBmp24(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val stride = bmpStride(width)
    val imageSize = stride * height
    val fileSize = 54 + imageSize
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER (14 bytes)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(fileSize).putShort(0).putShort(0).putInt(54)
    // BITMAPINFOHEADER (40 bytes)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(imageSize).putInt(2835).putInt(2835)
    buf.putInt(0).putInt(0)
    // pixel rows, bottom-up, BGR byte order
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y += 1
    }
    buf.array()
  }

  /** Decode a 24-bit uncompressed BMP: dimensions + exact per-channel
    * means over every pixel. */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return Unknown
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (bpp != 24 || compression != 0 || width <= 0 || height <= 0)
      return Unknown
    // totality against crafted headers: a negative dataOffset or an
    // Int-overflowing width*3 would pass a naive end-bound check and
    // then index negatively — validate offset range and compute the
    // stride in Long before narrowing
    if (dataOffset < 54 || dataOffset > bytes.length) return Unknown
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    // division-form bound check: strideL * height can overflow Long
    // for crafted width×height, silently passing a product comparison
    if (strideL > bytes.length - dataOffset ||
      height.toLong > (bytes.length - dataOffset) / strideL)
      return Unknown
    val stride = strideL.toInt
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      val row = dataOffset + y * stride
      var x = 0
      while (x < width) {
        val p = row + x * 3
        sb += bytes(p) & 0xff
        sg += bytes(p + 1) & 0xff
        sr += bytes(p + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    Decoded("bmp", Some(width), Some(height),
      Some(sr.toDouble / n), Some(sg.toDouble / n), Some(sb.toDouble / n),
      None, None, None, None)
  }

  // ------------------------------------------------------------------
  // WAV (RIFF, PCM, 16-bit)
  // ------------------------------------------------------------------

  /** Encode a mono 16-bit PCM WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)              // PCM
    buf.putShort(1)              // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)   // byte rate
    buf.putShort(2)              // block align
    buf.putShort(16)             // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parsed RIFF/WAVE layout (offsets into the original buffer). */
  private final case class RiffInfo(fmt: Int, channels: Int, bits: Int,
                                    sampleRate: Int, dataOff: Int,
                                    dataLen: Int)

  /** Hardened RIFF chunk walk shared by [[decodeWav]] and
    * [[decodeWavPcm]]. The walk runs in Long: a crafted length near
    * Int.MaxValue would wrap `off + 8 + len` negative in Int
    * arithmetic, pass the bound check, and index out of bounds on the
    * next iteration. None on anything malformed, never a throw. */
  private def parseRiff(bytes: Array[Byte]): Option[RiffInfo] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var sampleRate = 0; var channels = 0; var bits = 0; var fmt = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag(off.toInt)
      val len = buf.getInt(off.toInt + 4).toLong
      if (len < 0 || off + 8 + len > bytes.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmt = buf.getShort(off.toInt + 8).toInt
          channels = buf.getShort(off.toInt + 10).toInt
          sampleRate = buf.getInt(off.toInt + 12)
          bits = buf.getShort(off.toInt + 22).toInt
        case "data" =>
          dataOff = off.toInt + 8
          dataLen = len.toInt
        case _ => ()
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || dataOff < 0) None
    else Some(RiffInfo(fmt, channels, bits, sampleRate, dataOff, dataLen))
  }

  /** Decode a PCM-16 WAV via [[parseRiff]]: sample rate, sample
    * count, duration, exact mean sample value. */
  def decodeWav(bytes: Array[Byte]): Decoded =
    parseRiff(bytes) match {
      case Some(r)
        if r.fmt == 1 && r.bits == 16 && r.channels >= 1 =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val nFrames = r.dataLen / (2 * r.channels)
        var sum = 0L
        var i = 0
        while (i < nFrames * r.channels) {
          sum += buf.getShort(r.dataOff + i * 2)
          i += 1
        }
        val totalSamples = nFrames.toLong * r.channels
        Decoded("wav", None, None, None, None, None,
          Some(r.sampleRate), Some(totalSamples),
          Some(nFrames.toLong * 1000L / r.sampleRate),
          if (totalSamples == 0) None
          else Some(sum.toDouble / totalSamples))
      case _ => Unknown
    }

  /** Raw PCM extraction for the audio feature ops (mono PCM-16 only
    * — the synthesis/feature path's format); shares [[parseRiff]]'s
    * hardened walk. None on anything malformed, never a throw. */
  def decodeWavPcm(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    parseRiff(bytes) match {
      case Some(r)
        if r.fmt == 1 && r.bits == 16 && r.channels == 1 =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val n = r.dataLen / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = buf.getShort(r.dataOff + i * 2); i += 1 }
        Some((r.sampleRate, out))
      case _ => None
    }

  // ------------------------------------------------------------------
  // PNG / JPEG via the JDK's javax.imageio (headless-safe, no deps)
  // ------------------------------------------------------------------

  /** Encode a solid-color PNG through `ImageIO` — lossless, so a
    * constant-color image round-trips to EXACT per-channel means
    * (which is what keeps the decode oracle arithmetic). */
  def encodePng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)
    val row = Array.fill(width)(rgb)
    var y = 0
    while (y < height) { img.setRGB(0, y, width, 1, row, 0, width); y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Pixel cap for compressed-image decode: a ~100-byte adversarial
    * PNG can declare a 60000×60000 IHDR and make the reader allocate
    * a ~14 GB raster BEFORE any pixel data is validated — an
    * OutOfMemoryError, which is fatal and would escape any exception
    * guard, killing the executor. Dimensions are read from the header
    * FIRST (no pixel allocation) and oversized images decode to
    * `Unknown` instead. 64 M pixels ≈ 256 MB raster — generous for
    * corpus media, far below executor-killing. */
  val MaxImagePixels: Long = 64L * 1024 * 1024

  /** Decode a compressed image (PNG/JPEG — whatever the JRE's
    * `ImageIO` readers accept) to dimensions + per-channel means.
    * `getRGB` converts any source color model to packed sRGB, so the
    * channel extraction is uniform; rows are read in bulk to avoid a
    * per-pixel conversion call. A payload the reader rejects, a
    * decode error deep in the codec, or a decompression-bomb header
    * (see [[MaxImagePixels]]) yields `Unknown` — same totality
    * contract as the hand-rolled parsers above.
    *
    * The image input stream is an explicit MEMORY-cache stream: the
    * default `ImageIO.read(InputStream)` path wraps the (already
    * in-memory) bytes in a disk-backed FileCacheImageInputStream —
    * one temp-file write per decoded row on the hot path, and a
    * full/read-only executor tmpdir would silently turn the whole
    * corpus into `Unknown`. */
  def decodeImage(bytes: Array[Byte], format: String): Decoded =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Unknown
      val reader = readers.next()
      val img =
        try {
          reader.setInput(iis, true, true)
          // header-only dimension probe — no raster allocation yet
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels)
            return Unknown
          reader.read(0)
        } finally {
          reader.dispose()
          iis.close()
        }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) Unknown
      else {
        val w = img.getWidth
        val h = img.getHeight
        val row = new Array[Int](w)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sr += (p >> 16) & 0xff
            sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Decoded(format, Some(w), Some(h),
          Some(sr.toDouble / n), Some(sg.toDouble / n), Some(sb.toDouble / n),
          None, None, None, None)
      }
    } catch { case scala.util.control.NonFatal(_) => Unknown }

  /** Encode a per-pixel GRAYSCALE 24-bit BMP (r = g = b = gray(i)).
    * `gray` is row-major TOP-DOWN (`gray(y*width + x)`, y = 0 the top
    * row); the encoder writes the spec's bottom-up row order, and
    * [[decodeBmpLuma]] restores top-down — orientation round-trips,
    * which matters for position-sensitive signatures (dHash bit
    * indices are (x, y) addresses). */
  def encodeBmp24Gray(width: Int, height: Int,
                      gray: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height)
    val stride = bmpStride(width)
    val imageSize = stride * height
    val buf = ByteBuffer.allocate(54 + imageSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + imageSize).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(imageSize).putInt(2835).putInt(2835)
    buf.putInt(0).putInt(0)
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow // bottom-up storage
      var x = 0
      while (x < width) {
        val v = (gray(y * width + x) & 0xff).toByte
        buf.put(v).put(v).put(v)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    buf.array()
  }

  /** Decode a 24-bit BMP to its full LUMA grid — row-major TOP-DOWN,
    * luma = (r + g + b) / 3 integer mean per pixel (exact for the
    * grayscale encodes above). Same header totality guards as
    * [[decodeBmp]]; None on anything malformed. This is the grid
    * perceptual signatures ([[MultimodalOps.imageDHash]]) hash — the
    * mean-only [[decodeBmp]] cannot see WHERE pixels differ. */
  def decodeBmpLuma(bytes: Array[Byte])
      : Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B' || bytes(1) != 'M') return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    if (bpp != 24 || compression != 0 || width <= 0 || height <= 0)
      return None
    if (dataOffset < 54 || dataOffset > bytes.length) return None
    val strideL = ((width.toLong * 3 + 3) / 4) * 4
    if (strideL > bytes.length - dataOffset ||
      height.toLong > (bytes.length - dataOffset) / strideL)
      return None
    // luma raster cap — the decodeImage bomb guard applied here (an
    // in-bounds but huge BMP would otherwise allocate a giant array)
    if (width.toLong * height > MaxImagePixels) return None
    val stride = strideL.toInt
    val luma = new Array[Int](width * height)
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow
      val row = dataOffset + fileRow * stride
      var x = 0
      while (x < width) {
        val p = row + x * 3
        val b = bytes(p) & 0xff
        val g = bytes(p + 1) & 0xff
        val r = bytes(p + 2) & 0xff
        luma(y * width + x) = (r + g + b) / 3
        x += 1
      }
      fileRow += 1
    }
    Some((width, height, luma))
  }

  /** Sniff-and-decode: dispatch on magic bytes. */
  def decode(bytes: Array[Byte]): Decoded =
    if (bytes == null || bytes.length < 4) Unknown
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F') decodeWav(bytes)
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') decodeImage(bytes, "png")
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff) decodeImage(bytes, "jpeg")
    else Unknown
}
