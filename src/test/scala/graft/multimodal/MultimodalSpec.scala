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

  test("extractFeatures appends deterministic fixed-dim features; exactly the width-pin exchange") {
    val out = Multimodal.extractFeatures(media, "bytes", dim = 8, batchSize = 2)
    val rows = out.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == 8))
    assert(rows(1L) == rows(3L)) // same payload -> same features
    assert(rows(1L) != rows(2L))
    assert(rows.values.flatten.forall(f => f >= 0.0f && f < 1.0f))
    // ONE round-robin exchange — the deliberate decode width-pin
    // (spreadForDecode): a single-file media scan would otherwise
    // serialize all codec CPU on one task. Anything beyond that one
    // exchange is a regression.
    val exchanges = out.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1,
      s"decode should carry exactly the width-pin exchange, got ${exchanges.size}")
    assert(exchanges.head.outputPartitioning.toString.contains("RoundRobin"),
      exchanges.head.outputPartitioning.toString)
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

  test("averageHash is deterministic and invariant to lossless re-encoding") {
    val png = MediaCodec.digestPng("phash determinism")
    val h1 = Multimodal.averageHash(png).get
    assert(h1 == Multimodal.averageHash(png).get)
    // identical pixels re-encoded must hash equal; a 2x bilinear render
    // of a SMOOTH image stays within the measured worst-case 4 bits
    // while an unrelated image lands far away
    val smooth = MediaCodec.resizeImage(png, 8.0)
    assert(Multimodal.averageHash(MediaCodec.resizeImage(smooth, 1.0)).get ==
      Multimodal.averageHash(smooth).get)
    val twin = MediaCodec.resizeImage(png, 16.0)
    val d = java.lang.Long.bitCount(
      Multimodal.averageHash(smooth).get ^ Multimodal.averageHash(twin).get)
    assert(d <= 4, s"smooth twin drifted $d bits")
    val other = MediaCodec.resizeImage(MediaCodec.digestPng("different"), 8.0)
    val dOther = java.lang.Long.bitCount(
      Multimodal.averageHash(smooth).get ^ Multimodal.averageHash(other).get)
    assert(dOther > 4, s"unrelated images too close ($dOther bits)")
    // non-image payloads have no hash
    assert(Multimodal.averageHash("not an image".getBytes).isEmpty)
  }

  test("phashPairs finds smooth-render twins and only hamming<=maxDist pairs") {
    // 30 smooth "photos" (32x32 bilinear renders) + a 64x64 twin for
    // every 3rd — twins must pair with their original; all emitted pairs
    // must respect the distance bound; two runs must agree (determinism)
    val base = (0 until 30).map(i => (i.toLong, s"image seed $i"))
    val media = Multimodal.fromDigestPng(base.toDF("id", "txt"), "id", "txt")
    val originals = Multimodal.resizePayload(media, "bytes", 8.0)
    val twins = Multimodal.resizePayload(
      media.filter(col("media_id") % 3 === 0), "bytes", 16.0)
      .select((col("media_id") + 1000).as("media_id"), col("kind"),
        col("bytes"), col("meta"))
    val corpus = originals.unionByName(twins)
    val pairs = Multimodal.phashPairs(corpus, "media_id", "bytes", 3)
    val rows = pairs.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall(_._3 <= 3), s"distance bound violated: ${rows.mkString(",")}")
    val twinIds = base.map(_._1).filter(_ % 3 == 0)
    val found = twinIds.count(i => rows.exists(p => p._1 == i && p._2 == i + 1000))
    // aHash worst-case twin distance measured 4 bits on smooth renders —
    // allow one miss in ten, not zero
    assert(found >= twinIds.length * 9 / 10,
      s"twin recall $found/${twinIds.length}")
    val again = Multimodal.phashPairs(corpus, "media_id", "bytes", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // the decode→hash table is checkpointed before the band self-join:
    // the EXECUTED join plan must contain no decode (MapPartitions)
    // nodes at all — without the materialization the decode subtree
    // duplicates into both join sides (measured: 4 nodes, no reuse)
    val executed = pairs.queryExecution.executedPlan.toString
    assert(!executed.contains("MapPartitions"),
      s"decode ran inside the join plan:\n${executed.take(2000)}")
  }

  test("phashMergePairs equals the full rebuild (no-drift), decoding only the delta") {
    // split with twin pairs CROSSING it (twin = original + 1000; 1000 ≡ 1
    // mod 3, so original and twin land on different sides of a mod-3
    // split) — the merge must find base↔delta pairs, delta-internal
    // pairs, and keep base-base pairs untouched
    val base = (0 until 24).map(i => (i.toLong, s"image seed $i"))
    val media = Multimodal.fromDigestPng(base.toDF("id", "txt"), "id", "txt")
    val originals = Multimodal.resizePayload(media, "bytes", 8.0)
    val twins = Multimodal.resizePayload(
      media.filter(col("media_id") % 3 === 0), "bytes", 16.0)
      .select((col("media_id") + 1000).as("media_id"), col("kind"),
        col("bytes"), col("meta"))
    val corpus = originals.unionByName(twins).localCheckpoint()
    val baseSide = corpus.filter(col("media_id") % 3 =!= 1)
    val deltaSide = corpus.filter(col("media_id") % 3 === 1)
    assert(deltaSide.count() > 0 && baseSide.count() > 0)
    val baseHashes = Multimodal.averageHashes(baseSide, "media_id", "bytes")
      .localCheckpoint()
    val basePairs = Multimodal.phashPairsFromHashes(baseHashes, 3)
    val deltaHashes = Multimodal.averageHashes(deltaSide, "media_id", "bytes")
    def pset(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val merged = pset(Multimodal.phashMergePairs(
      baseHashes, basePairs, deltaHashes, 3))
    val rebuilt = pset(Multimodal.phashPairs(corpus, "media_id", "bytes", 3))
    assert(merged == rebuilt, s"merge drift: merged-only=${merged -- rebuilt} " +
      s"rebuilt-only=${rebuilt -- merged}")
    // ...and the merge actually crossed the split: at least one pair has
    // exactly one delta-side endpoint (mod-3 twin arithmetic guarantees
    // candidates exist unless twin recall collapsed entirely)
    assert(merged.exists(p => (p._1 % 3 == 1) != (p._2 % 3 == 1)),
      s"no base-delta pair found in $merged")
  }

  test("phashPairs drops undecodable payloads and rejects unreachable distance bounds") {
    // text payloads never decode: no hash, no pairs — and the banded
    // join's recall guarantee stops at hamming 3, so a looser bound is a
    // config error, not silent recall loss
    assert(Multimodal.phashPairs(media, "media_id", "bytes", 3).count() == 0)
    intercept[IllegalArgumentException] {
      Multimodal.phashPairs(media, "media_id", "bytes", 4)
    }
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
