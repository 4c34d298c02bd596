package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus the decode / feature-extract / frame-sample
  * plumbing a training-data pipeline needs.
  *
  * North-star extension (the reference is sensor-only). Decode is REAL
  * for every format the JDK itself ships a codec for — PNG/JPEG/BMP/GIF
  * via `javax.imageio`, WAV/AIFF PCM via `javax.sound.sampled`, and
  * MJPEG-AVI video via hand-walked RIFF container parsing over the JDK
  * JPEG codec (see [[MediaCodec]]) — dispatched by magic-byte sniff
  * inside the bounded batch loop. Payloads with no JVM-expressible codec
  * (compressed video codecs, webp, mp3, plain text) fall back to
  * `fakeDecode`, a deterministic md5-derived vector, so the pipeline
  * shape stays total and testable. The Spark side is a narrow no-shuffle
  * plan: schema, partition mapping, bounded-size batch iteration (the
  * JVM analogue of Arrow record-batch processing in mapInPandas).
  */
object Multimodal {

  /** Canonical media schema: id + modality + opaque payload + typed
    * metadata (unknown fields stay null rather than failing the scan).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("format", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Dispatching decode: real codec when the JDK has one for the sniffed
    * format, md5 fallback otherwise. A payload that sniffs as media but
    * fails its codec (truncated file) also falls back rather than
    * poisoning the batch — corrupt rows are a fact of 100 TB corpora.
    */
  private[multimodal] def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val real =
      if (MediaCodec.isImage(bytes)) MediaCodec.imageFeatures(bytes, dim)
      else if (MediaCodec.isWav(bytes)) MediaCodec.wavFeatures(bytes, dim)
      else if (MediaCodec.isAvi(bytes)) MediaCodec.videoFeatures(bytes, dim)
      else null
    if (real != null) real else fakeDecode(bytes, dim)
  }

  /** FALLBACK decode for non-media payloads: a deterministic `dim`-dim
    * feature vector from the md5 of the payload (each float in [0, 1)).
    */
  private[multimodal] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      // update(bytes); update(i) == md5(bytes ++ [i]) with ZERO copies —
      // `bytes ++ Array(i.toByte)` would copy the whole payload per dim
      md.update(bytes)
      md.update(i.toByte)
      val h = md.digest() // digest() resets for the next iteration
      // first 4 bytes → uint → [0,1)
      val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      (u.toDouble / (1L << 32)).toFloat
    }
  }

  /** Feature extraction over the binary column: mapPartitions in bounded
    * batches (batchSize rows decoded per inner loop — the memory contract
    * a real decoder needs, since decoded frames are much larger than their
    * compressed bytes). Appends `features array<float>`; all other
    * columns pass through untouched. No shuffle — partition-local.
    */
  def extractFeatures(df: DataFrame, bytesCol: String, dim: Int = 16,
      batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType), nullable = true)
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = RowEncoder.encoderFor(outSchema)
    spreadForDecode(df).mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // the batch bound is the decoder's memory contract: at most
        // `batchSize` decoded frames live at once
        batch.map { r =>
          val feats = decode(r.getAs[Array[Byte]](idx), dim)
          Row.fromSeq(r.toSeq :+ feats)
        }
      }
    }(enc)
  }

  /** Width-pin before any codec-bearing `mapPartitions`: a media corpus
    * arrives in however few partitions the file scan produced (ONE for a
    * single parquet file), and the decode CPU — codec dispatch +
    * per-row decompress, orders of magnitude heavier than the bytes —
    * then serializes on that width. Measured on the 10× scale probe:
    * `multimodal_audio_zcr` scaled SUPER-linearly (e = 1.28, 0.36 →
    * 6.98 s) purely from partition starvation. One narrow exchange of
    * the compressed rows buys full-cluster decode parallelism — the
    * `Dedup.fuzzyPairs` argument: the shuffle is bytes, the work behind
    * it is quadratic-in-cost CPU. Explicit N (the session's shuffle
    * parallelism) so AQE's byte-sighted coalescer cannot fold the
    * exchange back to one partition.
    */
  private def spreadForDecode(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Frame sampling for video-like payloads modeled as array<binary>
    * frames: keep every `nth` frame. Pure column expression — no UDF, no
    * shuffle.
    */
  def sampleFrames(df: DataFrame, framesCol: String, nth: Int): DataFrame =
    df.withColumn(framesCol,
      filter(col(framesCol), (_, i) => i % nth === 0))

  /** Metadata-only "resize": scale width/height in the typed meta struct —
    * the bookkeeping half of a resize (payload re-encode is part of the
    * stubbed codec). Null metas stay null.
    */
  def resizeMeta(df: DataFrame, metaCol: String, scale: Double): DataFrame =
    df.withColumn(metaCol,
      when(col(metaCol).isNotNull,
        struct(
          (col(s"$metaCol.width") * scale).cast("int").as("width"),
          (col(s"$metaCol.height") * scale).cast("int").as("height"),
          col(s"$metaCol.duration_ms").as("duration_ms"),
          col(s"$metaCol.format").as("format"))))

  /** Probe INTRINSIC metadata from the payload bytes (header-only — no
    * pixel decode): fills width/height/duration_ms/format in the typed
    * meta struct from what the bytes actually are, overriding whatever
    * the ingest claimed. Unknown formats keep the existing meta.
    * Partition-local mapPartitions, no shuffle.
    */
  def probeMeta(df: DataFrame, bytesCol: String, metaCol: String = "meta"): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val mIdx = df.schema.fieldIndex(metaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.probe(r.getAs[Array[Byte]](bIdx)) match {
          case Some((w, h, dur, fmt)) =>
            val meta = Row(w.orNull, h.orNull, dur.orNull, fmt)
            Row.fromSeq(r.toSeq.updated(mIdx, meta))
          case None => r
        }
      }
    }(enc)
  }

  /** REAL payload resize for image rows: decode → bilinear scale →
    * re-encode PNG, meta re-probed from the new bytes. Non-image payloads
    * pass through untouched. Bounded batches like `extractFeatures`.
    */
  def resizePayload(df: DataFrame, bytesCol: String, scale: Double,
      batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.map { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        if (bytes == null || !MediaCodec.isImage(bytes)) r
        else {
          val resized = MediaCodec.resizeImage(bytes, scale)
          if (resized == null) r else Row.fromSeq(r.toSeq.updated(bIdx, resized))
        }
      })
    }(enc)
  }

  /** Render a REAL 4×4 PNG per row from the md5 of a text column (see
    * [[MediaCodec.digestPng]]) — gives any text corpus a deterministic
    * image twin so the real decode path can be exercised (and
    * oracle-checked) without binary fixtures in the lake.
    */
  def fromDigestPng(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val outSchema = mediaSchema
    val enc = RowEncoder.encoderFor(outSchema)
    val src = df.na.drop("any", Seq(idCol)) // media_id is non-nullable
    val iIdx = src.schema.fieldIndex(idCol)
    val tIdx = src.schema.fieldIndex(textCol)
    src.mapPartitions { rows =>
      rows.map { r =>
        // null text → null payload + meta (the fromText convention);
        // extractFeatures passes null bytes through as null features
        if (r.isNullAt(tIdx))
          Row(r.getAs[Number](iIdx).longValue(), "image", null, null)
        else
          Row(r.getAs[Number](iIdx).longValue(), "image",
            MediaCodec.digestPng(r.getString(tIdx)), Row(4, 4, null, "image/png"))
      }
    }(enc)
  }

  /** The audio sibling of [[fromDigestPng]]: a REAL 8-sample PCM16 WAV
    * per row from the md5 of a text column ([[MediaCodec.digestWav]]).
    */
  def fromDigestWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val src = df.na.drop("any", Seq(idCol))
    val iIdx = src.schema.fieldIndex(idCol)
    val tIdx = src.schema.fieldIndex(textCol)
    src.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(tIdx))
          Row(r.getAs[Number](iIdx).longValue(), "audio", null, null)
        else
          Row(r.getAs[Number](iIdx).longValue(), "audio",
            MediaCodec.digestWav(r.getString(tIdx)),
            Row(null, null, 1L, "audio/wav"))
      }
    }(enc)
  }

  /** Exact integer sample statistics through the REAL javax.sound decode
    * ([[MediaCodec.wavSamples]]): count, sum, sum of squares, min, max
    * per media row — every output an exact BIGINT, so the whole
    * build→decode leg is oracle-checkable bit-exactly (the
    * multimodal_decode discipline for audio). Map-side only.
    */
  def wavSampleStats(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("s_sum", LongType, nullable = true),
      StructField("s_sqsum", LongType, nullable = true),
      StructField("s_min", LongType, nullable = true),
      StructField("s_max", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val src = spreadForDecode(df.select(col(idCol), col(bytesCol)))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Number](0).longValue()
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val s = if (bytes == null) null else MediaCodec.wavSamples(bytes)
        if (s == null || s.isEmpty) Row(id, null, null, null, null, null)
        else {
          var (sum, sq) = (0L, 0L)
          var mn = s(0).toLong; var mx = s(0).toLong
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sum += v; sq += v * v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
          Row(id, s.length.toLong, sum, sq, mn, mx)
        }
      }
    }(enc)
  }

  /** Zero-crossing-rate + RMS per PCM stream through the same real
    * decode leg as [[wavSampleStats]] — the first-order signal features
    * (voicing / noisiness proxies) beside the moment stats. A crossing
    * is a sign change between consecutive samples with zero counted
    * non-negative (`s >= 0`), mirrored exactly by the oracle's `lag`
    * comparison; `rms = round(sqrt(sqsum / n), 6)`.
    */
  def wavZcrFeatures(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("n_zero_cross", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    val src = spreadForDecode(df.select(col(idCol), col(bytesCol)))
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Number](0).longValue()
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val s = if (bytes == null) null else MediaCodec.wavSamples(bytes)
        if (s == null || s.isEmpty) Row(id, null, null, null)
        else {
          var sq = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            sq += v * v
            if (i > 0 && ((s(i) >= 0) != (s(i - 1) >= 0))) zc += 1
            i += 1
          }
          val rms = math.rint(math.sqrt(sq.toDouble / s.length) * 1e6) / 1e6
          Row(id, s.length.toLong, zc, rms)
        }
      }
    }(enc)
  }

  /** 64-bit average hash (aHash): decode, sample an 8×8 luminance grid,
    * threshold each cell at the grid mean — the standard perceptual
    * fingerprint for image near-dup (bit i set iff cell i is brighter
    * than average). Survives re-encoding, mild resizing, and small
    * noise; None for undecodable payloads.
    */
  def averageHash(bytes: Array[Byte]): Option[Long] = {
    // magic-byte sniff BEFORE ImageIO (the decode() dispatch discipline):
    // on a mixed media corpus every audio/video/text payload would
    // otherwise pay a full ImageReader provider probe just to return None
    if (!MediaCodec.isImage(bytes)) return None
    val lum = MediaCodec.imageFeatures(bytes, 64)
    if (lum == null) None
    else {
      var sum = 0.0; var i = 0
      while (i < 64) { sum += lum(i); i += 1 }
      val mean = sum / 64.0
      var h = 0L; i = 0
      while (i < 64) { if (lum(i) > mean) h |= (1L << i); i += 1 }
      Some(h)
    }
  }

  /** Image near-dup pairs by perceptual hash: aHash every payload, then
    * find pairs with hamming distance ≤ `maxDist`.
    *
    * Scale shape is the minhash-LSH band discipline transplanted to
    * hamming space: the 64-bit hash splits into 4 exact 16-bit bands, a
    * banded equi-join generates candidates (pigeonhole: two hashes
    * differing in ≤ 3 bits agree on at least one of 4 bands — no
    * recall loss at maxDist ≤ 3), and the exact hamming distance
    * (`bit_count(a ^ b)`, both codegen'd built-ins) filters them. The
    * only shuffle is the band join; never an all-pairs product. Decode
    * runs once per row in the same bounded-batch mapPartitions shape as
    * [[extractFeatures]]; undecodable payloads drop out (no hash, no
    * pair).
    */
  def phashPairs(media: DataFrame, idCol: String, bytesCol: String,
      maxDist: Int = 3, batchSize: Int = 64): DataFrame =
    // localCheckpoint EAGERLY: the hash table is 16 bytes/row while the
    // decode behind it is the dominant cost, and the band self-join below
    // references it on both sides — without materialization the decode
    // subtree is duplicated into each side (measured: no ReusedExchange
    // in the executed plan, 4 MapPartitions nodes). After the checkpoint
    // every image decodes exactly once; MultimodalSpec pins the executed
    // plan to zero in-plan decode nodes.
    phashPairsFromHashes(
      averageHashes(media, idCol, bytesCol, batchSize).localCheckpoint(),
      maxDist)

  /** The decode leg of [[phashPairs]] alone: aHash every payload to a
    * (media_id, ahash) table — the publishable artifact. Persisting this
    * output lets everything downstream of the (non-SQL-expressible)
    * ImageIO decode be replayed and hash-checked by a plain-SQL oracle.
    */
  def averageHashes(media: DataFrame, idCol: String, bytesCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val iIdx = media.schema.fieldIndex(idCol)
    val bIdx = media.schema.fieldIndex(bytesCol)
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(_.flatMap { r =>
        if (r.isNullAt(iIdx) || r.isNullAt(bIdx)) None
        else averageHash(r.getAs[Array[Byte]](bIdx))
          .map(h => Row(r.getAs[Number](iIdx).longValue(), h))
      })
    }(enc)
  }

  /** Banded hamming join over an already-hashed (media_id, ahash) table —
    * the SQL-expressible tail of [[phashPairs]].
    */
  def phashPairsFromHashes(hashed: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist=$maxDist: 4 exact bands only guarantee recall up to hamming 3 " +
        "- raise the band count for a looser threshold")
    val bands = hashed.select(col("media_id"), col("ahash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bh", expr("shiftrightunsigned(ahash, band * 16)")
        .bitwiseAND(0xffffL))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        expr("bit_count(a.ahash ^ b.ahash)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Incremental maintenance of [[phashPairs]] — the daily-ingest path
    * for a persisted image-dedup state (the knnGraphMerge / ShingleIndex
    * discipline applied to the aHash registry). Exact BY CONSTRUCTION,
    * not approximately: an aHash is a pure per-image function (no corpus
    * statistics — unlike minhash's df cap there is nothing to re-fit),
    * so `hashes(base ∪ delta) = hashes(base) ∪ hashes(delta)` and the
    * hamming-≤-d pair predicate is per-pair, giving
    *
    *   pairs(base ∪ delta) = pairs(base) ∪ {pairs with ≥ 1 delta side}
    *
    * disjointly. The step decodes ONLY the delta (the expensive leg) and
    * band-joins the delta hashes against base ∪ delta — O(delta ×
    * collisions), never a base×base re-join, never a base re-decode.
    * Caller contract: delta media ids are new (append-only, the
    * incrementalStepExact precondition); `basePairs` is [[
    * phashPairsFromHashes]] output over exactly `baseHashes`. No-drift
    * (merge == full rebuild) is pinned by MultimodalSpec and
    * driver-gated by `multimodal_phash_incr`'s full-rebuild oracle.
    */
  def phashMergePairs(baseHashes: DataFrame, basePairs: DataFrame,
      deltaHashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist=$maxDist: 4 exact bands only guarantee recall up to hamming 3 " +
        "- raise the band count for a looser threshold")
    def bands(h: DataFrame) = h.select(col("media_id"), col("ahash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bh", expr("shiftrightunsigned(ahash, band * 16)")
        .bitwiseAND(0xffffL))
    val all = bands(baseHashes.unionByName(deltaHashes))
    // delta probes all: one direction suffices because the output pair
    // is id-normalized below; a delta-delta collision arrives twice and
    // the distinct collapses it
    val newPairs = bands(deltaHashes).as("a").join(all.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.media_id") =!= col("b.media_id"))
      .select(least(col("a.media_id"), col("b.media_id")).as("media_a"),
        greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
        expr("bit_count(a.ahash ^ b.ahash)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    basePairs.select(col("media_a"), col("media_b"), col("hamming"))
      .unionByName(newPairs)
  }

  /** Build a media frame from any table with an id and a string payload —
    * lets the documents fixture stand in for a binary corpus in tests and
    * benchmarks.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit("text/plain").as("format")).as("meta"))
}
