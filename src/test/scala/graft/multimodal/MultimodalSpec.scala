package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello"), (2L, "world"), (3L, "hello")).toDF("id", "txt"), "id", "txt")

  test("fromText produces the canonical media schema") {
    assert(media.schema("bytes").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() == 3)
  }

  test("extractFeatures appends deterministic fixed-dim features, no shuffle") {
    val out = Multimodal.extractFeatures(media, "bytes", dim = 8, batchSize = 2)
    val rows = out.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == 8))
    assert(rows(1L) == rows(3L)) // same payload -> same features
    assert(rows(1L) != rows(2L))
    assert(rows.values.flatten.forall(f => f >= 0.0f && f < 1.0f))
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"), s"feature extraction must not shuffle:\n$plan")
  }

  test("extractFeatures passes null payloads through as null features") {
    val withNull = media.withColumn("bytes",
      when(col("media_id") === 2, lit(null).cast("binary")).otherwise(col("bytes")))
    val out = Multimodal.extractFeatures(withNull, "bytes", dim = 4).collect()
    val nulls = out.filter(_.isNullAt(out.head.fieldIndex("features")))
    assert(nulls.map(_.getAs[Long]("media_id")).toSeq == Seq(2L))
  }

  test("sampleFrames keeps every nth frame as a column expression") {
    val frames = Seq((1L, Seq("f0", "f1", "f2", "f3", "f4").map(_.getBytes)))
      .toDF("media_id", "frames")
    val out = Multimodal.sampleFrames(frames, "frames", 2)
      .select("frames").collect().head.getSeq[Array[Byte]](0)
    assert(out.map(new String(_)) == Seq("f0", "f2", "f4"))
  }

  test("resizeMeta scales width/height and keeps other fields") {
    val m = media.withColumn("meta", struct(
      lit(100).as("width"), lit(60).as("height"),
      lit(5000L).as("duration_ms"), lit("png").as("format")))
    val out = Multimodal.resizeMeta(m, "meta", 0.5).select("meta.*").collect().head
    assert(out.getAs[Int]("width") == 50 && out.getAs[Int]("height") == 30)
    assert(out.getAs[Long]("duration_ms") == 5000L)
    assert(out.getAs[String]("format") == "png")
  }
}
