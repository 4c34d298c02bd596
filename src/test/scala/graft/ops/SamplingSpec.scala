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

  test("scrub masks emails and digits, collapses whitespace") {
    val df = Seq((1L, "contact bob.smith@example.com  or   call 555 1234")).toDF("id", "text")
    val out = df.select(TextAnalysis.scrub(col("text"), Seq(
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+" -> "<EMAIL>",
      "[0-9]+" -> "<NUM>",
      "\\s+" -> " ")).as("s")).as[String].collect().head
    assert(out == "contact <EMAIL> or call <NUM> <NUM>", out)
  }
}
