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
  * North-star extension (the reference is sensor-only). The DECODE STEP IS
  * A STUB — no image/audio codecs exist in this container, so
  * `fakeDecode` derives a deterministic feature vector from the bytes'
  * md5. Everything around it is the real Spark shape: schema, partition
  * mapping, bounded-size batch iteration (the JVM analogue of Arrow
  * record-batch processing in mapInPandas), and a narrow no-shuffle plan.
  * Swapping in a real codec changes only the function body.
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

  /** STUB decode: a deterministic `dim`-dim feature vector from the md5 of
    * the payload (each float in [0, 1)). Replace with a real
    * codec+model; signature and determinism contract stay.
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
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would decode `batch` in one vectorized call here
        batch.map { r =>
          val feats = fakeDecode(r.getAs[Array[Byte]](idx), dim)
          Row.fromSeq(r.toSeq :+ feats)
        }
      }
    }(enc)
  }

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
