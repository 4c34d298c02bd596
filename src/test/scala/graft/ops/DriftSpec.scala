package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  // cohort A: uniform ints 0..99; cohort B shifted by +50 — KS should be
  // ~0.5 (half the mass separated), PSI clearly in the "shifted" band.
  private lazy val shifted = {
    val a = (0 until 2000).map(i => ("m1", i % 100 * 1.0, true))
    val b = (0 until 2000).map(i => ("m1", i % 100 * 1.0 + 50.0, false))
    (a ++ b).toDF("k", "v", "is_a")
  }

  test("identical cohorts: ks = 0 and psi = 0") {
    val same = (0 until 1000).flatMap(i =>
      Seq(("m", i % 40 * 1.0, true), ("m", i % 40 * 1.0, false)))
      .toDF("k", "v", "is_a")
    val ks = Drift.ksStatistic(same, "k", "v", col("is_a")).head().getDouble(1)
    val psi = Drift.psi(same, "k", "v", col("is_a")).head().getDouble(1)
    assert(ks == 0.0)
    assert(psi == 0.0)
  }

  test("a +50% range shift is detected by both statistics") {
    val ks = Drift.ksStatistic(shifted, "k", "v", col("is_a")).head().getDouble(1)
    assert(ks > 0.4 && ks <= 0.52, s"ks $ks") // ~half the mass disjoint
    val psi = Drift.psi(shifted, "k", "v", col("is_a")).head().getDouble(1)
    assert(psi > 0.25, s"psi $psi") // industry 'significant shift' band
  }

  test("keys are independent: a stable key is unaffected by a drifted one") {
    val stable = (0 until 1000).flatMap(i =>
      Seq(("s", i % 10 * 1.0, true), ("s", i % 10 * 1.0, false)))
      .toDF("k", "v", "is_a")
    val out = Drift.ksStatistic(shifted.unionByName(stable), "k", "v", col("is_a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("s") == 0.0)
    assert(out("m1") > 0.4)
  }

  test("constant-valued key yields 0 drift, not NULL/NaN (mn == mx guard)") {
    val const = (0 until 100).map(i => ("c", 5.0, i % 2 == 0)).toDF("k", "v", "is_a")
    val ks = Drift.ksStatistic(const, "k", "v", col("is_a")).head()
    assert(!ks.isNullAt(1) && ks.getDouble(1) == 0.0)
    val psi = Drift.psi(const, "k", "v", col("is_a")).head()
    assert(!psi.isNullAt(1) && psi.getDouble(1) == 0.0)
  }

  test("frozen reference edges: out-of-range live mass clamps into the " +
      "end bins and still registers as drift") {
    val ref = (0 until 1000).map(i => ("k", i % 100 * 1.0)).toDF("k", "v")
    // live entirely ABOVE the reference range → everything clamps to bin
    // 99 → ECDFs disagree maximally until the last bin
    val live = (0 until 1000).map(i => ("k", 500.0 + i)).toDF("k", "v")
    val ranges = Drift.referenceRanges(ref, "k", "v")
    val refH = Drift.binAgainst(ref, "k", "v", ranges)
      .groupBy("k", "__bin").agg(count(lit(1)).as("__na"))
    val liveH = Drift.binAgainst(live, "k", "v", ranges)
      .groupBy("k", "__bin").agg(count(lit(1)).as("__nb"))
    val joint = refH.join(liveH, Seq("k", "__bin"), "full_outer")
      .na.fill(0L, Seq("__na", "__nb"))
    val ks = Drift.ksOfCounts(joint, "k").head().getDouble(1)
    assert(ks > 0.98, s"ks $ks") // ref ECDF hits ~0.99 before live leaves 0
    // clamping really used the END bin, not an overflow bin
    val liveBins = Drift.binAgainst(live, "k", "v", ranges)
      .select("__bin").distinct().collect().map(_.getLong(0)).toSet
    assert(liveBins == Set(99L))
  }

  test("NaN and infinite readings are excluded like NULLs, not a crash " +
      "or a collapsed histogram") {
    val rows = (0 until 250).flatMap(i =>
      Seq(("k", i % 50 * 1.0, true), ("k", i % 50 * 1.0, false))) ++
      Seq(("k", Double.NaN, true), ("k", Double.PositiveInfinity, false),
        ("k", Double.NegativeInfinity, true))
    val df = rows.toDF("k", "v", "is_a")
    val ks = Drift.ksStatistic(df, "k", "v", col("is_a")).head().getDouble(1)
    // identical finite cohorts: the non-finite rows must not move ks off 0
    assert(ks == 0.0, s"ks $ks")
    val psi = Drift.psi(df, "k", "v", col("is_a")).head().getDouble(1)
    assert(psi == 0.0, s"psi $psi")
  }

  test("a live value astronomically beyond the frozen range clamps into " +
      "the end bin instead of overflowing the long cast") {
    val ref = (0 until 100).map(i => ("k", i * 0.001)).toDF("k", "v")
    val live = Seq(("k", 1.0e18), ("k", -1.0e18)).toDF("k", "v")
    val ranges = Drift.referenceRanges(ref, "k", "v")
    val bins = Drift.binAgainst(live, "k", "v", ranges)
      .select("__bin").collect().map(_.getLong(0)).toSet
    assert(bins == Set(99L, 0L), s"$bins")
  }

  test("psi smoothing keeps empty bins finite") {
    // cohort B entirely inside one bin, A spread out: many B-empty bins
    val a = (0 until 500).map(i => ("k", i * 1.0, true))
    val b = (0 until 500).map(_ => ("k", 1.0, false))
    val psi = Drift.psi((a ++ b).toDF("k", "v", "is_a"), "k", "v", col("is_a"))
      .head().getDouble(1)
    assert(!psi.isNaN && !psi.isInfinite && psi > 0.25, s"psi $psi")
  }
}
