package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-codec coverage: fixtures are generated in-memory with the same JDK
  * APIs a producer would use (ImageIO writers, AudioSystem), so the specs
  * prove actual PNG/JPEG/WAV byte streams decode — not hand-rolled fakes.
  */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  /** w×h horizontal gray gradient PNG: column x has value round(x*255/(w-1)). */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = math.round(x * 255.0 / (w - 1)).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Mono 16-bit PCM WAV: silence in the first half, full-scale square
    * wave in the second.
    */
  private def halfLoudWav(nSamples: Int): Array[Byte] = {
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](nSamples * 2)
    for (i <- nSamples / 2 until nSamples) {
      val s: Short = if (i % 2 == 0) 30000 else -30000
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("sniff recognizes PNG, JPEG, WAV and rejects text") {
    assert(MediaCodec.sniff(gradientPng(8, 8)) == "image/png")
    val jpeg = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    assert(MediaCodec.sniff(jpeg) == "image/jpeg")
    assert(MediaCodec.sniff(halfLoudWav(64)) == "audio/wav")
    assert(MediaCodec.sniff("just some text content".getBytes("UTF-8")) == "unknown")
    assert(MediaCodec.sniff(null) == "unknown")
  }

  test("imageFeatures samples an increasing luminance gradient") {
    val f = MediaCodec.imageFeatures(gradientPng(64, 4), dim = 4)
    assert(f.length == 4)
    // grid g=2: points at x = 16, 48 on both grid rows -> two low, two high
    assert(f(0) < f(1) && f(2) < f(3))
    assert(math.abs(f(0) - f(2)) < 1e-6 && math.abs(f(1) - f(3)) < 1e-6)
    assert(f.forall(v => v >= 0f && v <= 1f))
  }

  test("imageFeatures is exact on a digest PNG") {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8"))
    val f = MediaCodec.imageFeatures(MediaCodec.digestPng("abc"), dim = 16)
    for (i <- 0 until 16) {
      val v = d(i) & 0xff
      val expect = ((0.299 * v + 0.587 * v + 0.114 * v) / 255.0).toFloat
      assert(f(i) == expect, s"feature $i")
    }
  }

  test("wavFeatures finds the loud half") {
    val f = MediaCodec.wavFeatures(halfLoudWav(8000), dim = 4)
    assert(f.length == 4)
    assert(f(0) < 0.01f && f(1) < 0.01f)
    assert(f(2) > 0.8f && f(3) > 0.8f)
  }

  test("digestWav round-trips its md5 payload bit-exactly through javax.sound") {
    val bytes = MediaCodec.digestWav("hello world")
    assert(MediaCodec.sniff(bytes) == "audio/wav")
    val s = MediaCodec.wavSamples(bytes)
    assert(s.length == 8)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
    for (i <- 0 until 8) {
      val expect = (((d(2 * i + 1).toInt) << 8) | (d(2 * i) & 0xff)).toShort.toInt
      assert(s(i) == expect, s"sample $i")
    }
    // wavSamples rejects junk
    assert(MediaCodec.wavSamples("not audio".getBytes) == null)
  }

  test("RIFF fast path ≡ javax.sound on canonical WAVs; bails to null on everything else") {
    // parity on a spread of payload sizes (odd data sizes exercise padding)
    for (txt <- Seq("a", "hello world", "x" * 500)) {
      val bytes = MediaCodec.digestWav(txt)
      val fast = MediaCodec.wavSamplesRiff(bytes)
      assert(fast != null, s"fast path must handle digestWav($txt)")
      assert(fast.toSeq == MediaCodec.wavSamples(bytes).toSeq)
    }
    val loud = halfLoudWav(8000)
    val fastLoud = MediaCodec.wavSamplesRiff(loud)
    if (fastLoud != null) // only if halfLoudWav is canonical PCM16 RIFF
      assert(fastLoud.toSeq == MediaCodec.wavSamples(loud).toSeq)
    // junk, truncation, and a lying chunk size all return null (never throw)
    assert(MediaCodec.wavSamplesRiff("not audio".getBytes) == null)
    assert(MediaCodec.wavSamplesRiff(MediaCodec.digestWav("x").take(20)) == null)
    val lying = MediaCodec.digestWav("x").clone()
    lying(43) = 0x7f.toByte // data chunk size far beyond the buffer
    assert(MediaCodec.wavSamplesRiff(lying) == null)
  }

  test("probe reads image headers and wav duration without full decode") {
    val Some((w, h, _, fmt)) = MediaCodec.probe(gradientPng(37, 11))
    assert(w.contains(37) && h.contains(11) && fmt == "image/png")
    val Some((_, _, Some(ms), afmt)) = MediaCodec.probe(halfLoudWav(8000))
    assert(afmt == "audio/wav" && ms == 1000L) // 8000 samples at 8 kHz
    assert(MediaCodec.probe("not media".getBytes).isEmpty)
  }

  test("mp3 probe: frame-header walk yields exact duration, no decoder") {
    val mp3 = MediaCodec.buildMp3(38) // 38 frames of 1152 samples @ 44.1 kHz
    assert(MediaCodec.sniff(mp3) == "audio/mpeg")
    val Some((None, None, Some(ms), fmt)) = MediaCodec.probe(mp3)
    assert(fmt == "audio/mpeg" && ms == 38L * 1152 * 1000 / 44100)
    // a leading ID3v2 tag (syncsafe size) is skipped, not mis-parsed
    val tagged = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10) ++ mp3
    assert(MediaCodec.sniff(tagged) == "audio/mpeg")
    assert(MediaCodec.probe(tagged).flatMap(_._3).contains(ms))
    // ID3v2.4 footer flag (0x10): 10 extra bytes after the counted size
    val footered = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 10) ++
      new Array[Byte](10 + 10) ++ mp3
    assert(MediaCodec.probe(footered).flatMap(_._3).contains(ms))
    // other bitrate/sample-rate combinations honor the tables
    val m48 = MediaCodec.buildMp3(10, bitrateKbps = 192, sampleRate = 48000)
    assert(MediaCodec.probe(m48).flatMap(_._3).contains(10L * 1152 * 1000 / 48000))
    // 0xFF-prefixed garbage fails the header validity checks -> unknown
    assert(MediaCodec.sniff(Array.fill[Byte](20)(0xff.toByte)) == "unknown")
  }

  test("webp probe reads dimensions from VP8 / VP8L / VP8X chunk headers") {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def webp(cc: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + payload.length) ++
        "WEBP".getBytes("US-ASCII") ++ cc.getBytes("US-ASCII") ++
        le32(payload.length) ++ payload
    // lossless: 0x2F signature + LE32 of (w-1) | (h-1)<<14
    val vp8l = webp("VP8L", Array(0x2f.toByte) ++ le32(36L | (11L << 14)) ++
      new Array[Byte](8))
    assert(MediaCodec.sniff(vp8l) == "image/webp")
    assert(MediaCodec.probe(vp8l).map(p => (p._1, p._2)) ==
      Some((Some(37), Some(12))))
    // lossy: 3-byte frame tag, 9D 01 2A sync, 14-bit LE dims
    val vp8 = webp("VP8 ", Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (640 & 0xff).toByte, (640 >> 8).toByte,
      (480 & 0xff).toByte, (480 >> 8).toByte) ++ new Array[Byte](4))
    assert(MediaCodec.probe(vp8).map(p => (p._1, p._2)) ==
      Some((Some(640), Some(480))))
    // extended: 4 flag/reserved bytes + 24-bit canvas dims-1
    val vp8x = webp("VP8X", Array[Byte](0, 0, 0, 0,
      31, 0, 0, 63, 0, 0) ++ new Array[Byte](4))
    assert(MediaCodec.probe(vp8x).map(p => (p._1, p._2)) ==
      Some((Some(32), Some(64))))
    // corrupt lossless signature: unprobeable, not wrong numbers
    val bad = webp("VP8L", Array(0x00.toByte) ++ le32(36L) ++ new Array[Byte](8))
    assert(MediaCodec.probe(bad).isEmpty)
  }

  test("resizeImage halves dimensions and re-encodes decodable PNG") {
    val out = MediaCodec.resizeImage(gradientPng(64, 32), 0.5)
    val Some((w, h, _, _)) = MediaCodec.probe(out)
    assert(w.contains(32) && h.contains(16))
  }

  test("magic-byte collisions and truncated files fall back, never throw") {
    // UTF-8 text that sniffs as BMP/GIF — the codec must not crash the task
    val bmpish = "BM this is actually a sentence about bitmaps.".getBytes("UTF-8")
    assert(MediaCodec.sniff(bmpish) == "image/bmp")
    assert(MediaCodec.imageFeatures(bmpish, 4) == null)
    assert(MediaCodec.probe(bmpish).isEmpty)
    assert(MediaCodec.resizeImage(bmpish, 0.5) == null)
    val truncated = gradientPng(16, 16).take(30) // valid magic, cut body
    assert(MediaCodec.imageFeatures(truncated, 4) == null)
    // and the dispatching decode lands on the deterministic fallback
    assert(Multimodal.decode(bmpish, 4).toSeq == Multimodal.fakeDecode(bmpish, 4).toSeq)
  }

  test("fromDigestPng tolerates null text and drops null ids") {
    // boxed Long column so the id is genuinely nullable
    val docs = Seq[(java.lang.Long, String)](
      (java.lang.Long.valueOf(1L), "ok"),
      (java.lang.Long.valueOf(2L), null),
      (null, "no id — must be dropped")).toDF("doc_id", "text")
    val out = Multimodal.fromDigestPng(docs, "doc_id", "text").orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(1).isNullAt(out(1).fieldIndex("bytes")))
    val feats = Multimodal.extractFeatures(
      Multimodal.fromDigestPng(docs, "doc_id", "text"), "bytes", dim = 4)
      .orderBy("media_id").collect()
    assert(feats(1).isNullAt(feats(1).fieldIndex("features")))
  }

  /** Solid-gray JPEG frame at luminance v. */
  private def grayJpeg(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (v << 16) | (v << 8) | v)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("MJPEG-AVI round trip: build → sniff → frames → features → probe") {
    val frames = Seq(grayJpeg(16, 8, 0), grayJpeg(16, 8, 128), grayJpeg(16, 8, 255))
    val avi = MediaCodec.buildMjpegAvi(frames, 16, 8, fps = 10)
    assert(MediaCodec.sniff(avi) == "video/avi")

    val back = MediaCodec.aviFrames(avi)
    assert(back.size == 3)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })

    // gray v decodes to ~v/255 luminance in every cell (JPEG is lossy —
    // generous tolerance); 3-frame average ≈ (0 + 128/255 + 1) / 3
    val f = MediaCodec.videoFeatures(avi, dim = 4)
    assert(f != null && f.length == 4)
    val expected = (0.0 + 128.0 / 255 + 1.0) / 3
    assert(f.forall(v => math.abs(v - expected) < 0.05), f.toSeq)

    val Some((w, h, dur, fmt)) = MediaCodec.probe(avi)
    assert(w.contains(16) && h.contains(8) && fmt == "video/avi")
    assert(dur.contains(300L)) // 3 frames at 10 fps

    // malformed container: truncation falls back, never throws
    assert(MediaCodec.aviFrames(avi.take(40)).isEmpty)
    assert(MediaCodec.videoFeatures(avi.take(40), 4) == null)
  }

  test("frame sampling bounds the decode cost of long videos") {
    val frames = (0 until 20).map(i => grayJpeg(8, 8, i * 12))
    val avi = MediaCodec.buildMjpegAvi(frames, 8, 8, fps = 5)
    // maxFrames=4 samples evenly; average of frames 0,5,10,15 ≈ mean gray
    val f = MediaCodec.videoFeatures(avi, dim = 4, maxFrames = 4)
    val expected = Seq(0, 5, 10, 15).map(_ * 12 / 255.0).sum / 4
    assert(f.forall(v => math.abs(v - expected) < 0.05), f.toSeq)
  }

  test("animated GIF frames feed the same grid sampler") {
    // ImageIO writes multi-frame GIFs through the sequence API
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    for (v <- Seq(0, 255)) {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence(); ios.close(); w.dispose()
    val gif = bos.toByteArray
    assert(MediaCodec.sniff(gif) == "image/gif")
    val f = MediaCodec.gifFrameFeatures(gif, dim = 4)
    // two frames, black then white → average ≈ 0.5 everywhere
    assert(f != null && f.forall(v => math.abs(v - 0.5) < 0.02), f.toSeq)
  }

  test("Multimodal.decode dispatches real codecs with fake fallback") {
    val png = gradientPng(8, 8)
    assert(Multimodal.decode(png, 4).toSeq ==
      MediaCodec.imageFeatures(png, 4).toSeq)
    val wav = halfLoudWav(256)
    assert(Multimodal.decode(wav, 4).toSeq ==
      MediaCodec.wavFeatures(wav, 4).toSeq)
    val avi = MediaCodec.buildMjpegAvi(Seq(grayJpeg(8, 8, 128)), 8, 8, fps = 1)
    assert(Multimodal.decode(avi, 4).toSeq ==
      MediaCodec.videoFeatures(avi, 4).toSeq)
    val txt = "plain text".getBytes("UTF-8")
    assert(Multimodal.decode(txt, 4).toSeq ==
      Multimodal.fakeDecode(txt, 4).toSeq)
  }

  test("probeMeta fills intrinsic metadata from the payload") {
    val df = Seq((1L, gradientPng(20, 10)), (2L, "nope".getBytes))
      .toDF("id", "bytes")
      .withColumn("meta", lit(null).cast(Multimodal.mediaSchema("meta").dataType))
    val out = Multimodal.probeMeta(df, "bytes").orderBy("id").collect()
    val m1 = out(0).getStruct(out(0).fieldIndex("meta"))
    assert(m1.getAs[Int]("width") == 20 && m1.getAs[Int]("height") == 10)
    assert(m1.getAs[String]("format") == "image/png")
    assert(out(1).isNullAt(out(1).fieldIndex("meta"))) // unknown: untouched
  }

  test("resizePayload re-encodes image rows and passes others through") {
    val df = Seq((1L, gradientPng(40, 20)), (2L, "text".getBytes))
      .toDF("id", "bytes")
    val out = Multimodal.resizePayload(df, "bytes", 0.5).orderBy("id").collect()
    val Some((w, h, _, _)) = MediaCodec.probe(out(0).getAs[Array[Byte]](1))
    assert(w.contains(20) && h.contains(10))
    assert(new String(out(1).getAs[Array[Byte]](1)) == "text")
  }

  test("fromDigestPng renders real PNGs whose features match the digest") {
    val docs = Seq((7L, "some doc text")).toDF("doc_id", "text")
    val media = Multimodal.fromDigestPng(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, "bytes", dim = 16)
      .select("features").collect().head.getSeq[Float](0)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("some doc text".getBytes("UTF-8"))
    for (i <- 0 until 16) {
      val v = d(i) & 0xff
      assert(feats(i) == ((0.299 * v + 0.587 * v + 0.114 * v) / 255.0).toFloat)
    }
  }
}
