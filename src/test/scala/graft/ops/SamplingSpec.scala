package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 4000L).map(i =>
    (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr")).toDF("id", "lang")

  test("hashSample keeps ~fraction, deterministically, as a pure id function") {
    val a = Sampling.hashSample(docs, "id", 0.3)
    val b = Sampling.hashSample(docs, "id", 0.3)
    assert(a.exceptAll(b).isEmpty) // same rows every run
    val n = a.count().toDouble / 4000
    assert(n > 0.25 && n < 0.35, s"kept fraction $n")
    // smaller fraction is a SUBSET of larger (nested samples — incremental
    // pipelines can tighten rates without churning membership)
    val small = Sampling.hashSample(docs, "id", 0.1)
    assert(small.exceptAll(a).isEmpty)
    // repartitioning does not change membership (rand(seed) would)
    val shuffled = Sampling.hashSample(docs.repartition(13), "id", 0.3)
    assert(shuffled.exceptAll(a).isEmpty && a.exceptAll(shuffled).isEmpty)
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val out = Sampling.stratifiedSample(docs, "id", "lang",
      Map("en" -> 1.0, "de" -> 0.2), defaultFraction = 0.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 1000) // rate 1.0 keeps every en row
    assert(byLang.getOrElse("fr", 0L) == 0) // default 0 drops the rest
    val deRate = byLang("de").toDouble / 1000
    assert(deRate > 0.13 && deRate < 0.27, s"de rate $deRate")
  }

  test("targetMix hits target proportions, keeps the scarcest stratum whole") {
    // docs: en 1000, de 1000, fr 2000. Targets en 0.5 / fr 0.25:
    // feasible total = min(1000/0.5, 2000/0.25) = 2000 -> en kept whole
    // (its rate is exactly 1.0 in doubles: 0.5 is a power of two),
    // fr downsampled to ~500, untargeted de dropped entirely
    val out = Sampling.targetMix(docs, "id", "lang", Map("en" -> 0.5, "fr" -> 0.25))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 1000, s"en ${byLang.get("en")}")
    assert(byLang.getOrElse("de", 0L) == 0L)
    assert(byLang("fr") > 420 && byLang("fr") < 580, s"fr ${byLang("fr")}")
    // deterministic: a rerun on a different layout selects the same rows
    val again = Sampling.targetMix(docs.repartition(11), "id", "lang",
      Map("en" -> 0.5, "fr" -> 0.25))
    assert(again.exceptAll(out).isEmpty && out.exceptAll(again).isEmpty)
    // scaling every share by a constant changes nothing (shares need not sum to 1)
    val scaled = Sampling.targetMix(docs, "id", "lang", Map("en" -> 2.0, "fr" -> 1.0))
    assert(scaled.exceptAll(out).isEmpty && out.exceptAll(scaled).isEmpty)
    // a target over a missing stratum is a config error, not silence
    intercept[IllegalArgumentException] {
      Sampling.targetMix(docs, "id", "lang", Map("xx" -> 1.0))
    }
  }

  test("capPerKey keeps at most cap rows per stratum, nested and layout-independent") {
    val out = Sampling.capPerKey(docs, "id", "lang", 100)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.values.forall(_ == 100L), s"per-stratum counts $byLang")
    // a stratum under the cap keeps everything
    val tiny = Sampling.capPerKey(docs.filter(col("id") <= 10), "id", "lang", 100)
    assert(tiny.count() == 10)
    // nested: cap-50 survivors ⊂ cap-100 survivors (tightening never churns)
    val smaller = Sampling.capPerKey(docs, "id", "lang", 50)
    assert(smaller.exceptAll(out).isEmpty)
    // membership is a pure function of the data, not the partition layout
    val shuffled = Sampling.capPerKey(docs.repartition(17), "id", "lang", 100)
    assert(shuffled.exceptAll(out).isEmpty && out.exceptAll(shuffled).isEmpty)
  }

  test("scrub masks emails and digits, collapses whitespace") {
    val df = Seq((1L, "contact bob.smith@example.com  or   call 555 1234")).toDF("id", "text")
    val out = df.select(TextAnalysis.scrub(col("text"), Seq(
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+" -> "<EMAIL>",
      "[0-9]+" -> "<NUM>",
      "\\s+" -> " ")).as("s")).as[String].collect().head
    assert(out == "contact <EMAIL> or call <NUM> <NUM>", out)
  }

  test("packSequences fills windows contiguously per shard") {
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 100L), (4L, 600L))
      .toDF("doc_id", "n_tokens")
    // one shard: packing order is plain id order
    val out = Sampling.packSequences(docs, "doc_id", "n_tokens",
        budgetTokens = 512L, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("bin"), r.getAs[Long]("offset"),
        r.getAs[Long]("end_bin")))
    // starts: 0, 300, 600, 700
    assert(out(0) == ((1L, 0L, 0L, 0L)))     // 0..299 in bin 0
    assert(out(1) == ((2L, 0L, 300L, 1L)))   // 300..599 straddles into bin 1
    assert(out(2) == ((3L, 1L, 88L, 1L)))    // 600..699 inside bin 1
    assert(out(3) == ((4L, 1L, 188L, 2L)))   // 700..1299 ends in bin 2
  }

  test("packSequences invariants hold for arbitrary token distributions") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0L, 900L)))
      .map(_.groupBy(_._1).map { case (id, vs) => (id, vs.head._2) }.toSeq)
    val p = Prop.forAll(rowsGen) { rows =>
      val out = Sampling.packSequences(rows.toDF("doc_id", "n_tokens"),
          "doc_id", "n_tokens", budgetTokens = 512L, shards = 4)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"),
          r.getAs[Long]("offset"), r.getAs[Long]("end_bin")))
      out.groupBy(_._2).values.forall { shardRows =>
        val ordered = shardRows.sortBy(_._1)
        // local replay of the contiguous fill
        var start = 0L
        ordered.forall { case (_, _, n, bin, offset, endBin) =>
          val ok = bin == start / 512 && offset == start % 512 &&
            offset >= 0 && offset < 512 &&
            endBin == (start + math.max(n, 1) - 1) / 512 && endBin >= bin
          start += n
          ok
        }
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("packSequences shard assignment is deterministic and partition-independent") {
    val docs = (1L to 200L).map(i => (i, 50L + i % 7)).toDF("doc_id", "n_tokens")
    val a = Sampling.packSequences(docs, "doc_id", "n_tokens", 512L, 8)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Sampling.packSequences(docs.repartition(13), "doc_id", "n_tokens", 512L, 8)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // every shard's bins fill from 0 without a leading gap
    a.groupBy(_(1)).values.foreach { rows =>
      assert(rows.map(_(3).asInstanceOf[Long]).min == 0L)
    }
  }
}
