package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** REAL media decode on JDK built-ins only — no external codec jars.
  * `javax.imageio` handles PNG/JPEG/BMP/GIF/WBMP; `javax.sound.sampled`
  * handles WAV/AIFF/AU PCM. This retires the round-1 "decode is a stub"
  * caveat for the formats the JVM itself ships: only exotic codecs
  * (video, webp, mp3) remain behind the deterministic fake fallback.
  *
  * Everything here is executor-side scalar code called from
  * `Multimodal.extractFeatures`'s bounded-batch mapPartitions — the
  * driver never sees a payload.
  */
object MediaCodec {

  // ImageIO's default stream cache is FILE-backed: every decode/encode
  // would create and delete a temp file — pure overhead for byte-array
  // payloads that are already in memory. Executor-wide, set once.
  ImageIO.setUseCache(false)

  /** Cheap content sniff by magic bytes — runs before any codec is
    * touched, so non-media payloads never pay a decode attempt.
    */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int) = if (bytes != null && bytes.length > i) bytes(i) & 0xff else -1
    if (bytes == null || bytes.length < 12) "unknown"
    else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image/png"
    else if (at(0) == 0xff && at(1) == 0xd8) "image/jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "image/gif"
    else if (at(0) == 'B' && at(1) == 'M') "image/bmp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "audio/wav"
    else "unknown"
  }

  def isImage(bytes: Array[Byte]): Boolean = sniff(bytes).startsWith("image/")
  def isWav(bytes: Array[Byte]): Boolean = sniff(bytes) == "audio/wav"

  /** Decode an image and sample a `dim`-point luminance grid in [0, 1]:
    * point i sits at the center of cell (i % g, i / g) of a g×rows grid
    * (g = ceil(sqrt(dim))). Luminance is the standard Rec.601 weighting
    * `(0.299 r + 0.587 g + 0.114 b) / 255` computed in double and
    * truncated to float — the exact association order is part of the
    * oracle contract (mirrored in DuckDB SQL by the decode query).
    * Returns null if no ImageIO reader accepts the bytes.
    */
  def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    // a magic-byte collision (text starting "BM"/"GIF8") or a truncated
    // file must fall back, not fail the task — corrupt rows are a fact of
    // 100 TB corpora; decode errors surface as null → caller's fallback
    val img = try ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return null
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    val rows = (dim + g - 1) / g
    Array.tabulate(dim) { i =>
      val x = (((i % g) + 0.5) / g * img.getWidth).toInt.min(img.getWidth - 1)
      val y = (((i / g) + 0.5) / rows * img.getHeight).toInt.min(img.getHeight - 1)
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff; val gr = (rgb >> 8) & 0xff; val b = rgb & 0xff
      ((0.299 * r + 0.587 * gr + 0.114 * b) / 255.0).toFloat
    }
  }

  /** Decode PCM audio (WAV/AIFF/AU) and return a `dim`-window RMS
    * envelope in [0, 1] (16-bit samples normalized by 2^15). Returns null
    * if the bytes are not a parseable audio stream.
    */
  def wavFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val in = try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    catch { case _: Exception => return null }
    try {
      val fmt = in.getFormat
      if (fmt.getSampleSizeInBits != 16) return null
      val data = in.readAllBytes()
      val bigEndian = fmt.isBigEndian
      val n = data.length / 2
      if (n == 0) return Array.fill(dim)(0f)
      val out = new Array[Float](dim)
      val counts = new Array[Int](dim)
      val sums = new Array[Double](dim)
      var i = 0
      while (i < n) {
        val lo = data(2 * i + (if (bigEndian) 1 else 0)) & 0xff
        val hi = data(2 * i + (if (bigEndian) 0 else 1)).toInt
        val s = ((hi << 8) | lo).toShort.toDouble / 32768.0
        val w = (i.toLong * dim / n).toInt.min(dim - 1)
        sums(w) += s * s; counts(w) += 1
        i += 1
      }
      var w = 0
      while (w < dim) {
        out(w) = if (counts(w) == 0) 0f else math.sqrt(sums(w) / counts(w)).toFloat
        w += 1
      }
      out
    } finally in.close()
  }

  /** Probe intrinsic metadata without a full pixel decode: images via the
    * ImageIO reader header (width/height/format), WAV via frame count /
    * frame rate (duration). Unknown formats return null.
    */
  def probe(bytes: Array[Byte]): Option[(Option[Int], Option[Int], Option[Long], String)] =
    sniff(bytes) match {
      case f if f.startsWith("image/") =>
        // header parse of a magic-byte-colliding payload throws — treat
        // as unprobeable, same as the decode fallback
        try {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          try {
            val readers = ImageIO.getImageReaders(iis)
            if (!readers.hasNext) None
            else {
              val r = readers.next()
              try {
                r.setInput(iis)
                Some((Some(r.getWidth(0)), Some(r.getHeight(0)), None, f))
              } finally r.dispose()
            }
          } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      case "audio/wav" =>
        try {
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val ms = (in.getFrameLength * 1000.0 / in.getFormat.getFrameRate).toLong
            Some((None, None, Some(ms), "audio/wav"))
          } finally in.close()
        } catch { case _: Exception => None }
      case _ => None
    }

  /** Real payload resize: decode, scale by `scale` (min 1×1), bilinear
    * redraw, re-encode as PNG. Returns null if the bytes don't decode.
    */
  def resizeImage(bytes: Array[Byte], scale: Double): Array[Byte] = {
    val img = try ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return null
    val w = math.max(1, (img.getWidth * scale).toInt)
    val h = math.max(1, (img.getHeight * scale).toInt)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    try {
      g2.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, w, h, null)
    } finally g2.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 4×4 RGB PNG from the md5 of a UTF-8 string: pixel
    * (x, y) is digest byte `4 y + x` replicated to r=g=b. Gives any text
    * corpus a REAL image twin whose decoded luminance is computable in
    * plain SQL (`md5` + byte extraction) — how the decode path gets an
    * oracle. TYPE_INT_RGB deliberately: a gray-colorspace image would go
    * through color management in getRGB and break the byte↔pixel map.
    */
  def digestPng(text: String): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 16) {
      val v = d(i) & 0xff
      img.setRGB(i % 4, i / 4, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
