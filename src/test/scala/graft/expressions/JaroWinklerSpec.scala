package graft.expressions

import graft.SparkSpec
import graft.ops.Linkage
import org.apache.spark.sql.functions._

/** Jaro-Winkler pinned against the oracle engine's
  * `jaro_winkler_similarity` (values captured from DuckDB 2026-08;
  * the full algorithm was additionally fuzz-compared on 30k random
  * pairs with zero mismatches before these pins were recorded).
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private val pins = Seq(
    ("martha", "marhta", 0.9611111111111111), // classic Winkler example
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("large bolt", "large bolts", 0.9818181818181818),
    ("cold widget", "old widget", 0.9696969696969697), // no common prefix
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("a", "", 0.0),
    ("x", "y", 0.0),
    ("CRATE", "TRACE", 0.7333333333333334), // jaro ≤ 0.7 + prefix 0
    // sub-threshold jaro with a 3-char common prefix: NOT boosted —
    // the classic 0.7 boost gate, verified against the oracle engine
    ("abcxxxxx", "abcyyyyy", 0.5833333333333334),
    ("aaaa", "aabbbb", 0.611111111111111),
    // boost present, prefix capped at 4 despite 5 common chars
    ("zzzzz", "zzzzzabcdefghij", 0.8666666666666666),
    ("ab", "abcdefgh", 0.8))

  test("static helper matches the oracle engine on every pinned pair") {
    pins.foreach { case (a, b, want) =>
      val got = JaroWinkler.simStr(a, b)
      assert(math.abs(got - want) < 1e-12, s"($a, $b): got $got want $want")
    }
  }

  test("DataFrame path (codegen) agrees with the static helper, null-safe") {
    val df = pins.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(Linkage.jaroWinkler(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    pins.map(_._3).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1e-12)
    }
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    assert(withNull.select(Linkage.jaroWinkler(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("symmetry and bounds on random-ish pairs") {
    val words = Seq("alpha", "alpaca", "beta", "betamax", "gamma", "gam",
      "delta", "dealt", "omega", "o")
    for (a <- words; b <- words) {
      val ab = JaroWinkler.simStr(a, b)
      assert(ab == JaroWinkler.simStr(b, a))
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b) assert(ab == 1.0)
    }
  }

  test("jwPairs blocks, scores, and never pairs a name with itself") {
    val df = Seq("cold widget", "old widget", "bold widget", "cold bolt",
      "old bolt", "red rod").toDF("nm")
    val pairs = Linkage.jwPairs(df, "nm",
      element_at(split(col("name"), " "), 2), minSim = 0.8).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b) // canonical order, no self-pairs, no duplicates
      // same block (noun token) by construction
      assert(a.split(" ")(1) == b.split(" ")(1))
      assert(r.getDouble(2) >= 0.8)
    }
    // cross-block pair never appears even if similar
    assert(!pairs.exists(r => r.getString(0).endsWith("bolt") &&
      r.getString(1).endsWith("widget")))
  }
}
